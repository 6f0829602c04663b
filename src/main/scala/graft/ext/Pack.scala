package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators (SURVEY.md §2b extension surface):
  * sequence packing and corpus-LM document scoring — the steps between a
  * cleaned corpus and a tokenized training run.
  */
object Pack {

  /** Sequence-packing manifest: documents are concatenated in `idCol` order
    * WITHIN A SHARD and sliced into consecutive `seqLen`-token training
    * sequences (the standard concat-and-chunk regime); each doc's row says
    * which sequences its tokens land in —
    * (id, shard, n_tokens, start_seq, end_seq, n_seqs).
    *
    * Sharding is the scale contract: a single global packing order would
    * funnel 100 TB through ONE window partition (a one-reducer sort). Each
    * shard packs independently — exactly how a multi-worker tokenizer run
    * behaves — so the window parallelism equals the shard count; pick
    * shards ≫ executors (e.g. `hash(id) % 10_000`). Sequence ids are
    * per-shard; (shard, seq) is the global sequence key.
    *
    * Token counting is the whitespace tokenizer of [[TextOps.tokens]] —
    * one contract for every token-count consumer in the library.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long, shardCol: Column): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardCol)
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("__graft_cum", sum(col("n_tokens")).over(w))
      // integer div (not /): long division on token offsets must truncate
      .withColumn("start_seq", expr(s"(__graft_cum - n_tokens) div $seqLen"))
      .withColumn("end_seq", expr(s"(__graft_cum - 1) div $seqLen"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + lit(1))
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("start_seq"), col("end_seq"), col("n_seqs"))
  }

  /** Corpus-bigram LM score per document: mean MLE probability of the doc's
    * POSITIONAL bigrams (duplicates count — this is a language-model
    * statistic, not set similarity) under the corpus itself,
    * p(w2 | w1) = count(w1 w2) / count(w1), with count(w1) the token's
    * total corpus occurrences. High score = the doc's word transitions are
    * corpus-typical; boilerplate and keyword-stuffed docs score low. The
    * fluency cousin of the Gopher frequency rules.
    *
    * Cross-engine determinism: each probability is scaled to an integer
    * (`round(p * 1e9)`) BEFORE summing, so the aggregate is an exact
    * integer sum — a float sum's result would depend on partition
    * association order. Output: (id, n_bigrams, p_sum_scaled,
    * lm_avg_scaled = p_sum_scaled div n_bigrams). Docs with < 2 tokens
    * have no bigrams and no row.
    *
    * Shape at 100 TB: the exploded POSITIONAL bigram stream is shuffled
    * exactly ONCE — an explicit repartition on the bigram — and every
    * wide consumer rides that one exchange co-partitioned: the corpus
    * bigram counts are a partial-combined aggregate of it, the
    * vocab-granularity probability table (cb ⋈ cu) hash-joins back onto
    * it without moving it, and the per-doc rollup partial-aggregates
    * map-side so its exchange carries docs×partitions rows. (The former
    * shape first aggregated per-(doc, bigram) multiplicities — but
    * positional bigrams are nearly unique within a doc, so that pass
    * shrank almost nothing and cost a second full-stream shuffle when the
    * probability join re-keyed it on the bigram.) Per-positional-bigram
    * integer rounding (`round(p·1e9)` BEFORE the sum) is unchanged. No
    * driver-side model, no broadcast of the vocabulary.
    */
  def bigramLmScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("ts"))
    // materialized once: the bigram-count aggregate AND the final
    // probability join both read this relation, and the planner does NOT
    // reuse the exchange between them (measured: 3 Generate + 8 Exchange
    // nodes without the checkpoint — the corpus exploded three times). At
    // production scale this is the bigram-stream table you'd persist;
    // localCheckpoint also carries the bg-partitioning into both readers.
    val stream = toks.select(col("id"),
        explode(graft.functions.ShingleStrings.shingleStrings(col("ts"), 2)).as("bg"))
      .repartition(col("bg"))
      .localCheckpoint()
    val bc = stream.groupBy("bg").agg(count(lit(1)).as("cb"))
    // Unigram counts WITHOUT re-exploding the token stream: every token
    // occurrence is the first word of exactly one bigram occurrence, or the
    // LAST token of its document. So cu(w) = Σ cb over bigrams starting
    // with w, plus the per-doc last-token counts — the second corpus-wide
    // explode+shuffle becomes a one-row-per-document projection. Only words
    // that start a bigram are ever probability denominators (pTab joins on
    // exactly that set), so a left join suffices.
    val firsts = bc.select(substring_index(col("bg"), " ", 1).as("w1"), col("cb"))
      .groupBy("w1").agg(sum(col("cb")).as("__cf"))
    val lasts = toks.select(element_at(col("ts"), -1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("__cl"))
    val uni = firsts.join(lasts, Seq("w1"), "left")
      .select(col("w1"),
        (col("__cf") + coalesce(col("__cl"), lit(0L))).as("cu"))
    val pTab = bc
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni, Seq("w1"))
      .select(col("bg"),
        round(col("cb").cast("double") / col("cu").cast("double") * lit(1e9))
          .cast("long").as("ps"))
    // build side = pTab (vocab-granularity); the stream side stays put on
    // its one exchange — a sort-merge here would sort the full stream
    stream.join(pTab.hint("shuffle_hash"), Seq("bg"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ps")).as("p_sum_scaled"))
      .withColumn("lm_avg_scaled", expr("p_sum_scaled div n_bigrams"))
  }
}
