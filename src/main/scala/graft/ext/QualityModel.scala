package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring: a hashed bag-of-words LINEAR
  * classifier (the fastText hashing trick — Joulin et al., "Bag of Tricks
  * for Efficient Text Classification", 2016; the C4/CCNet pipelines gate
  * documents on exactly this operator shape with trained weights).
  *
  * logit(doc) = bias + mean over tokens of w[h(token) mod dim] — token
  * features hash into a FIXED `dim`-bucket weight vector, so the model is
  * a small dense array regardless of vocabulary size, and scoring is a
  * pure per-row map: a zero-shuffle scan-side fold, the correct 100 TB
  * shape for model inference over a corpus (weights broadcast as plan
  * literals; nothing aggregates until someone groups the scores).
  *
  * The hash is the md5-derived portable base word ([[SimHashPortable]]) so
  * an external oracle reproduces bucket assignment bit-for-bit; the token
  * fold sums exact INTEGER weights (see [[WeightScale]]) so the score
  * derives from bit-identical inputs in every engine. Weights
  * here are deterministic placeholder values from [[defaultWeights]] —
  * production swaps in trained weights without touching the plan.
  */
object QualityModel {

  /** Logit scale: integer weights count in 1/500 units, so the per-doc
    * token fold is EXACT integer arithmetic — association-order-proof. The
    * only float ops (one divide, one add, one round) run on bit-identical
    * integer inputs in every engine, so the rounded score can never
    * straddle a tie boundary differently across dialects (a float-weight
    * fold was measured doing exactly that at sf0.01).
    */
  val WeightScale: Double = 500.0

  /** Deterministic placeholder INTEGER weights in [-500, 500] (1/500
    * units): fixed integer-hash values an oracle embeds as exact literals.
    */
  def defaultWeights(dim: Int, seed: Long = 12345L): Array[Long] =
    Array.tabulate(dim) { i =>
      ((i * 2654435761L + seed) % 1001 + 1001) % 1001 - 500
    }

  /** Hash bucket of one token: low 31 bits of the md5 base word, mod dim —
    * non-negative in every engine's integer semantics (the full 64-bit word
    * is signed in Spark and unsigned in DuckDB, so a direct mod diverges).
    */
  private def bucket(t: Column, dim: Int): Column =
    (shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))
      .bitwiseAND(lit(2147483647L)) % dim).cast("int")

  /** (id, q_num, n_tokens, q_score, keep) per document: the EXACT integer
    * logit numerator `q_num = biasUnits·n_tokens + Σ w[h(token)]` (logit =
    * q_num / (WeightScale·n_tokens)), the float rendering `q_score`, and
    * the keep decision — computed from the INTEGER rule `q_num >= 0`,
    * never from the float, so the filter boundary is exact in any engine.
    * (`bias = biasUnits / WeightScale`; an earlier float-rounded gate
    * measured engines disagreeing on systematic round-to-6 near-ties.)
    *
    * The per-token fold runs as a higher-order `aggregate` over the token
    * array — interpreted per element, which is fine at verification scale;
    * the 100 TB swap is a LexiconHits-style codegen kernel with the same
    * contract (per-row, zero shuffle), not a different plan shape.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Long], biasUnits: Long): DataFrame = {
    require(weights.nonEmpty, "need at least one weight bucket")
    val wLit = array(weights.toSeq.map(lit(_)): _*)
    val toks = TextOps.tokens(col(textCol))
    val folded = aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(wLit, bucket(t, weights.length) + 1))
    val n = size(toks).cast("long")
    df.select(col(idCol),
        (lit(biasUnits) * n + folded).as("q_num"), n.as("n_tokens"))
      .withColumn("q_score",
        when(col("n_tokens") > 0,
          col("q_num").cast("double") / (lit(WeightScale) * col("n_tokens").cast("double")))
          .otherwise(lit(biasUnits.toDouble / WeightScale)))
      .withColumn("keep", col("q_num") >= 0L)
  }

  /** DuckDB rendering of the SAME bucket assignment (drift-proofing
    * pattern: one generator, two dialects — like [[SimHashPortable]]).
    */
  def bucketDuckSql(tok: String, dim: Int): String =
    s"CAST(CAST((CAST(('0x' || substr(md5($tok), 1, 16)) AS UBIGINT) & 2147483647) " +
      s"AS BIGINT) % $dim AS INTEGER)"

  /** Weight array as a DuckDB list literal (exact integers). */
  def weightsDuckSql(weights: Array[Long]): String =
    weights.mkString("[", ", ", "]")
}
