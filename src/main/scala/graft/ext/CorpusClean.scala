package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning for training data — the composed pipeline a
  * reference user actually runs, built from the individually-gated
  * operators: quality gate → language keep-list → near-dup removal.
  *
  * Stage order matters at 100 TB: the per-row quality/language predicates
  * are shuffle-free scans that shrink the corpus BEFORE the only expensive
  * stage (the near-dup pair join) sees it. Near-dup detection runs among
  * the survivors — removing a low-quality doc must not also remove its
  * high-quality near-duplicate's canonical status.
  */
object CorpusClean {

  /** @param minTokens   keep docs with at least this many whitespace tokens
    * @param maxPunct    keep docs with punctuation ratio at most this
    * @param langs       keep docs whose predicted language is in this set
    * @param n           shingle width for near-dup detection
    * @param threshold   Jaccard near-dup threshold
    * @return the surviving rows of `df` (original columns)
    */
  def run(df: DataFrame, idCol: String, textCol: String,
          minTokens: Int, maxPunct: Double,
          langs: Seq[String], n: Int, threshold: Double): DataFrame = {
    val t = col(textCol)
    val kept = df
      .filter(TextOps.tokenCount(t) >= minTokens)
      // punctRatio is NULL for empty text, and NULL <= maxPunct filters out
      .filter(TextOps.punctRatio(t) <= maxPunct)
      .filter(TextOps.languageId(t, TextOps.defaultLexicons).isin(langs: _*))
      // materialize the (much smaller) surviving corpus once: the near-dup
      // stage consumes it three times (both sides of the pair self-join +
      // the survivor join), and each re-read would re-run the full
      // quality/language scoring scan. At production scale this is the
      // stage boundary you'd write to a table; localCheckpoint is the
      // single-job equivalent.
      .localCheckpoint()
    Dedup.dropNearDups(kept, idCol, textCol, n, threshold)
  }
}
