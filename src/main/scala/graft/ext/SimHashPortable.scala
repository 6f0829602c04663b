package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash with a PORTABLE per-token base hash — md5, which Spark and
  * DuckDB both compute identically over UTF-8 — so the full
  * tokenize → hash → vote → fingerprint pipeline is renderable in BOTH
  * dialects from ONE generator (the [[graft.ops.ZOrder]] drift-proofing
  * pattern: the engines can never disagree about a formula they share).
  *
  * Base hash = first 16 hex digits of `md5(token)` as a 64-bit word
  * (Spark: two 32-bit `conv` halves ORed — `conv` of the full 16 digits
  * would overflow BIGINT; DuckDB: one `'0x…'::UBIGINT` cast — same bits,
  * unsigned). Fingerprint bit j is set iff more token hashes have bit j
  * set than clear (`2·ones > n`, ties clear the bit), the exact vote rule
  * of the xxhash64 production kernel
  * ([[graft.functions.SketchFunctions.simhash64]]).
  */
object SimHashPortable {

  /** 64-bit md5-derived base hash of a token, Spark dialect. */
  def baseSparkSql(tok: String): String =
    s"(shiftleft(CAST(conv(substr(md5($tok), 1, 8), 16, 10) AS BIGINT), 32) | " +
      s"CAST(conv(substr(md5($tok), 9, 8), 16, 10) AS BIGINT))"

  /** The SAME base hash, DuckDB dialect (unsigned word, identical bits). */
  def baseDuckSql(tok: String): String =
    s"CAST(('0x' || substr(md5($tok), 1, 16)) AS UBIGINT)"

  /** Fingerprint AGGREGATE over grouped per-token base hashes `b`, Spark
    * dialect: 64 vote sums, bit j set iff strictly more ones than zeros.
    */
  def fpAggSparkSql(b: String): String =
    (0 until 64).map { j =>
      s"(CASE WHEN 2 * sum(shiftrightunsigned($b, $j) & 1) > count($b) " +
        s"THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** The SAME fingerprint aggregate, DuckDB dialect (UBIGINT word; bit
    * weights as direct literals — DuckDB's `<<` promotes through signed
    * BIGINT and overflows at bit 63).
    */
  def fpAggDuckSql(b: String): String =
    (0 until 64).map { j =>
      s"(CASE WHEN 2 * sum(CAST(($b >> $j) & 1 AS BIGINT)) > count($b) " +
        s"THEN CAST(${BigInt(1) << j} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
    }.mkString("(", " + ", ")")

  /** (id, simhash) fingerprints via the portable formula, computed by the
    * scan-side [[graft.functions.SketchFunctions.simhash64Md5]] kernel —
    * no explode, no shuffle, same shape as the xxhash64 production path
    * (the explode + 64-sum rendition of [[fpAggSparkSql]] was measured 5×
    * slower at sf0.1). The kernel is pinned to the rendered formula two
    * ways: DedupSpec asserts the md5 base word against the JDK digest and
    * [[fingerprintsSql]] against this output, and the per-round driver
    * hash gate re-proves it against the DuckDB render on every run.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        graft.functions.SketchFunctions.simhash64Md5(
          TextOps.tokens(col(textCol))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The rendered-SQL form of [[fingerprints]] (explode + 64 vote sums) —
    * the drift-proofing reference the kernel is spec-checked against.
    */
  def fingerprintsSql(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull)
      .withColumn("b", expr(baseSparkSql("t")))
      .groupBy("id").agg(expr(fpAggSparkSql("b")).as("simhash"))
}
