package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of a document's word `n`-gram shingles, in one
  * pass over the string.
  *
  * The declarative formulation — `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, n))))` — runs on the interpreted
  * higher-order-function path and allocates a sliced array + joined string
  * per shingle; on a corpus scan that is the dominant cost of every
  * shingle-based dedup operator (measured 4.2s of an 11s Jaccard join at
  * sf0.1). Set-similarity math (Jaccard, MinHash) only consumes shingle
  * IDENTITY, never the text, so this expression tokenizes once, combines
  * per-token hashes into rolling n-gram hashes (avalanche mix over the
  * window), and dedups into a long array — zero intermediate strings.
  *
  * Collision caveat: two distinct shingles colliding in 64 bits would
  * perturb set sizes (birthday bound ≈ 2^32 distinct shingles — far beyond
  * any single corpus partition's shingle vocabulary).
  *
  * CodegenFallback: per-row work (split, hashing) dwarfs the virtual-call
  * overhead codegen would save; the expression is still null-safe and
  * vectorizer-friendly on the scan side.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    // byte-for-byte the old `.trim.split("\\s+")` tokens (FastTokens parity
    // tests pin it) — hash VALUES must not move or LSH bucketing shifts
    val tokens = FastTokens.splitJava(input.asInstanceOf[UTF8String].toString)
    if (tokens.length < n) return ArrayData.toArrayData(Array.empty[Long])
    // stable per-token hashes, then windowed combine with avalanche finish
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) { th(i) = fnv1a(tokens(i)); i += 1 }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= tokens.length - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) { h = mix(h, th(i + j)); j += 1 }
      out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    ArrayData.toArrayData(arr)
  }

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** murmur-style combine+avalanche so adjacent windows decorrelate. */
  private def mix(acc: Long, v: Long): Long = {
    var h = acc ^ v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Distinct hashed word n-gram shingles of a string column. */
  def shingleHashes(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))
}

/** String-emitting sibling of [[ShingleHashes]]: all contiguous word
  * `n`-grams of a token array, space-joined, in order, duplicates kept.
  *
  * Exists for the term-frequency path (`txt_top_bigrams`), which needs the
  * shingle TEXT, not just identity. The declarative form —
  * `transform(sequence(1, size-n+1), i => concat_ws(" ", slice(ts, i, n)))`
  * — is interpreted (HOF) and allocates a sliced array per shingle; this
  * expression emits each window with one `UTF8String.concatWs`, no
  * intermediate arrays. Output is byte-identical to the HOF form (tokens
  * joined by a single space), so oracle hashes are unaffected.
  *
  * Takes the token ARRAY (from [[graft.ext.TextOps.tokens]]) rather than raw
  * text so tokenization semantics live in exactly one place.
  */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  /** All space-joined word n-gram shingles of a token-array column. */
  def shingleStrings(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleStrings(GraftBridge.expression(tokens), n))
}
