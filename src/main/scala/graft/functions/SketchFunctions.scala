package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass sketch builders for the dedup family (SURVEY.md §2b).
  *
  * The declarative formulations shuffle the exploded shingle/token relation
  * and aggregate N separate columns — `min(xxhash64(i, s))` × 128 for
  * MinHash, `sum(bit_vote_j)` × 64 for SimHash. That is a shuffle plus an
  * N-wide aggregation buffer per document and a giant codegen unit; measured
  * as the two slowest queries of the round-1 bench (17.7 s + 8.9 s at
  * sf0.1). A sketch is a pure function of ONE document's shingle/token
  * multiset, so these expressions compute it per-row during the scan:
  * no explode, no shuffle, constant memory.
  *
  * Hash-family parity: both reuse Spark's own XXH64 primitives with the
  * same seed chaining as the SQL `xxhash64` function (seed 42), so sketch
  * values are bit-identical to the former aggregate formulation — specs and
  * downstream banding are unaffected.
  *
  * CodegenFallback: per-row hashing loops dwarf the virtual-call overhead
  * codegen would save (same trade as [[ShingleHashes]]).
  */
object SketchFunctions {

  /** Spark's `xxhash64` seed (`HashExpression.DEFAULT_SEED`). */
  private[functions] val XxSeed = 42L

  /** MinHash signature: element i = min over the input 64-bit shingle
    * hashes s of `xxhash64(i, s)` (chained exactly like the two-argument
    * SQL function: `hashLong(s, hashInt(i, 42))`).
    *
    * NULL for an empty shingle array — mirrors the aggregate formulation,
    * where a document with no shingles contributes no exploded rows and
    * therefore no signature row.
    */
  def minhashSketch(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSketch(GraftBridge.expression(shingles), numHashes))

  /** 64-bit SimHash over a token array: each token's xxhash64 votes ±1 on
    * each bit position; fingerprint bit j is set iff the vote sum is
    * positive. NULL for an empty token array (explode-parity, as above).
    */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** [[simhash64]] with the PORTABLE md5 base hash (first 16 md5 hex digits
    * as one big-endian 64-bit word — the formula
    * [[graft.ext.SimHashPortable]] renders for both SQL dialects): same
    * vote rule, same NULL contract, a base hash an external oracle can
    * recompute. The per-round driver hash gate is what pins this kernel to
    * the rendered formula.
    */
  def simhash64Md5(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens), md5Base = true))

  private val md5Digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 bytes of the UTF-8 token, big-endian (== the first 16 hex
    * digits as a word).
    */
  private[functions] def md5First8(bytes: Array[Byte]): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }
}

case class MinHashSketch(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> shingle hashes, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set -> NULL
  override def prettyName: String = "minhash_sketch"

  // per-function seeds: hashInt(i, 42) is the chain state after xxhash64's
  // first argument, constant per position
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, SketchFunctions.XxSeed))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(s, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression, md5Base: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${dt.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty token array -> NULL
  override def prettyName: String = if (md5Base) "simhash64_md5" else "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h =
          if (md5Base) SketchFunctions.md5First8(tok.getBytes)
          else XXH64.hashUTF8String(tok, SketchFunctions.XxSeed)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
