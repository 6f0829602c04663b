package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: remove documents that
  * share at least `minOverlap` distinct word n-grams with a benchmark/eval
  * set (the standard n-gram-overlap contamination rule, e.g. GPT-3 appendix
  * C / PaLM §6).
  *
  * Shape at 100 TB: the benchmark side is tiny (eval sets are thousands of
  * docs) — its distinct shingle set BROADCASTS, so the corpus-side cost is
  * one scan + one broadcast semi-join + one aggregate on matching doc ids;
  * the full corpus never shuffles. Shingles are the same 64-bit
  * [[graft.functions.ShingleHashes]] sets the Jaccard family uses (distinct
  * by construction; hash-collision caveat identical to the gated
  * `dedup_ngram_jaccard`).
  */
object Decontaminate {

  /** (id, n_overlap) for every corpus doc sharing ≥1 distinct n-gram with
    * the benchmark; docs with zero overlap are absent.
    */
  def overlapCounts(df: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val benchSh = bench
      .select(explode(graft.functions.ShingleHashes.shingleHashes(col(benchTextCol), n)).as("s"))
      .distinct()
    df.select(col(idCol).as("id"),
        explode(graft.functions.ShingleHashes.shingleHashes(col(textCol), n)).as("s"))
      .join(broadcast(benchSh), "s")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
  }

  /** The corpus minus contaminated docs (overlap ≥ `minOverlap`). */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int, minOverlap: Long): DataFrame = {
    val bad = overlapCounts(df, idCol, textCol, bench, benchTextCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .withColumnRenamed("id", idCol)
      .select(idCol)
    df.join(bad, Seq(idCol), "left_anti")
  }
}
