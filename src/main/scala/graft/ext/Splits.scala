package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines (SURVEY.md §2b
  * extension surface): every row lands in exactly one named split, decided
  * by a digest of its key — stable across runs, engines, partitionings, and
  * cluster sizes, which `randomSplit` is not (it reseeds per partition).
  *
  * Mechanism: the first 8 hex chars of `md5(key)` are uniform over
  * [0, 16^8); cumulative fraction thresholds are rendered as zero-padded
  * hex strings and compared LEXICOGRAPHICALLY — pure string comparison, so
  * any engine with md5 reproduces the assignment byte-for-byte (the gate
  * relies on this).
  */
object Splits {

  /** Hex threshold for a cumulative fraction, zero-padded to 8 chars. */
  /** The uniform [0, 16^8) keep-coin: first 8 hex chars of the salted key
    * digest. ONE definition shared by every digest-threshold op
    * (splitColumn, weightedKeep, Sampling.qualityBucketSample) — the
    * byte-for-byte cross-engine contract of their oracles hangs on this
    * exact expression.
    */
  private[ext] def hexDigest(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")), 1, 8)

  private[ext] def hexThreshold(cum: Double): String = {
    val v = math.min((cum * 4294967296.0).toLong, 4294967295L) // 16^8 - 1
    f"$v%08x"
  }

  /** Assignment column: named splits with the given fractions (must sum to
    * ~1; the last split absorbs rounding). `salt` decorrelates independent
    * splits of the same keys.
    */
  def splitColumn(key: Column, fractions: Seq[(String, Double)], salt: String = ""): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val h = hexDigest(key, salt)
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    // last branch is the otherwise-arm: rounding can't orphan rows
    fractions.init.zip(cums.init).reverse.foldLeft(
      lit(fractions.last._1): Column) {
      case (acc, ((name, _), cum)) => when(h < hexThreshold(cum), lit(name)).otherwise(acc)
    }
  }

  /** DataFrame form: adds `splitCol` with the assignment. */
  def byHash(df: DataFrame, keyCol: String, fractions: Seq[(String, Double)],
             splitCol: String = "split", salt: String = ""): DataFrame =
    df.withColumn(splitCol, splitColumn(col(keyCol), fractions, salt))

  /** Weighted source mixing: keep each row with its source's rate — the
    * "2 epochs of wiki, 0.3 of web crawl" knob of a training-data recipe,
    * deterministic per key (same digest-threshold mechanism as
    * [[splitColumn]], so a re-run, a different partitioning, or another
    * engine keeps exactly the same rows). Sources absent from `rates` are
    * DROPPED — a mixing recipe is an allow-list. Rate >= 1.0 is special-
    * cased to literal TRUE (in the oracle too): a strict `< "ffffffff"`
    * compare would silently drop the ~1-in-2^32 keys whose digest prefix is
    * exactly the threshold — real losses at billions of rows.
    *
    * Shape at 100 TB: pure per-row predicate on a scan — no shuffle, no
    * join; the rates map is query-literal config (a CASE over sources),
    * not a table.
    */
  def weightedKeep(df: DataFrame, keyCol: String, sourceCol: String,
                   rates: Map[String, Double], salt: String = ""): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val h = hexDigest(col(keyCol), salt)
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (src, r)) =>
        val keepSrc = if (r >= 1.0) lit(true) else h < hexThreshold(r)
        when(col(sourceCol) === src, keepSrc).otherwise(acc)
    }
    df.filter(keep)
  }

  /** DuckDB-equivalent predicate for [[weightedKeep]] oracle SQL. */
  def oracleKeepPredicate(keyExpr: String, sourceExpr: String,
                          rates: Map[String, Double], salt: String = ""): String = {
    val h = s"substr(md5($keyExpr || '$salt'), 1, 8)"
    val whens = rates.toSeq.sortBy(_._1).map { case (src, r) =>
      val keepSrc = if (r >= 1.0) "TRUE" else s"$h < '${hexThreshold(r)}'"
      s"WHEN $sourceExpr = '$src' THEN $keepSrc"
    }
    s"CASE ${whens.mkString(" ")} ELSE FALSE END"
  }

  /** The DuckDB-equivalent CASE expression for oracle SQL (same thresholds,
    * same digest) — kept next to the implementation so they cannot drift.
    */
  def oracleCase(keyExpr: String, fractions: Seq[(String, Double)], salt: String = ""): String = {
    val h = s"substr(md5($keyExpr || '$salt'), 1, 8)"
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val whens = fractions.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN $h < '${hexThreshold(cum)}' THEN '$name'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${fractions.last._1}' END"
  }
}
