package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** BagBound / MyersBound are only usable as join-condition prefilters if
  * they NEVER exceed the true levenshtein distance — a single overshoot
  * would silently drop a matching pair from the fuzzy join.
  */
class EditBoundSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  private def u(s: String) = UTF8String.fromString(s)

  private val asciiish: Gen[String] = for {
    n <- Gen.choose(0, 50)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.oneOf(' ', '.', ',', 'é', 'ß', '日')))
  } yield cs.mkString

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("both bounds never exceed the true distance (500 generated pairs)") {
    (0 until 500).foreach { i =>
      val a = sample(asciiish, 1000L + i)
      val b = sample(asciiish, 9000L + i)
      val d = lev(a, b)
      val bag = BagBound.bound(u(a), u(b))
      val myers = MyersBound.bound(u(a), u(b))
      assert(bag <= d, s"bag bound $bag > dist $d for '$a' vs '$b'")
      assert(myers <= d, s"myers bound $myers > dist $d for '$a' vs '$b'")
    }
  }

  test("perturbed strings: bounds stay under the true distance") {
    (0 until 300).foreach { i =>
      val s0 = sample(asciiish, 333L + i)
      val s = if (s0.length >= 5) s0 else s0 + "abcde" // ensure room to edit
      val k = 1 + i % 5
      var t = s
      (0 until k).foreach { e =>
        val p = math.abs((i * 31 + e * 7) % math.max(1, t.length))
        val c = ('a' + (i + e) % 26).toChar
        (i + e) % 3 match {
          case 0 if t.nonEmpty => t = t.updated(math.min(p, t.length - 1), c)
          case 1 => t = t.take(p) + c + t.drop(p)
          case _ if t.nonEmpty => t = t.take(p) + t.drop(p + 1)
          case _ => ()
        }
      }
      val d = lev(s, t)
      assert(MyersBound.bound(u(s), u(t)) <= d, s"'$s' vs '$t'")
      assert(BagBound.bound(u(s), u(t)) <= d, s"'$s' vs '$t'")
    }
  }

  test("myers exactness on collision-free ASCII letters") {
    // lowercase letters occupy distinct 6-bit bins — the hashed distance IS
    // the true distance there; pin the tightness (what makes the prefilter
    // effective) so it doesn't silently regress
    val letters = Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
    (0 until 200).foreach { i =>
      val a = sample(letters, 5L + i)
      val b = sample(letters, 77000L + i)
      assert(MyersBound.bound(u(a), u(b)) == lev(a, b), s"'$a' vs '$b'")
    }
  }

  test("edge shapes: empty, identical, >64-codepoint pattern") {
    assert(MyersBound.bound(u(""), u("")) == 0)
    assert(MyersBound.bound(u(""), u("abc")) == 3)
    assert(MyersBound.bound(u("abc"), u("")) == 3)
    assert(MyersBound.bound(u("same"), u("same")) == 0)
    assert(MyersBound.bound(u("a" * 65), u("b")) == 0, "trivial bound past 64 cps")
    assert(MyersBound.bound(u("a" * 64), u("")) == 64, "64-cp pattern still exact")
    assert(BagBound.bound(u(""), u("xyz")) == 3)
    assert(BagBound.bound(u("ab"), u("ba")) == 0, "bag is order-blind (still a bound)")
  }
}
