package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring in the fastText/CCNet/DCLM shape: hash
  * unigram + bigram features into a fixed bucket space, look the buckets
  * up in a (bucket, weight) table, and average — the linear classifier
  * every modern curation pipeline runs over the raw crawl to rank
  * documents by "looks like reference text".
  *
  * Weights are integer-scaled longs (1e6 units): the score is an exact
  * long sum + two IEEE divisions, bit-identical across engines and
  * partitionings, so a DuckDB oracle re-derives every logit. The weight
  * TABLE is the deployment seam — [[hashWeights]] provides a
  * deterministic md5 stand-in for tests/oracles; production loads real
  * trained weights (sparse tables work: unmatched buckets weigh 0 via
  * the left join).
  *
  * Scale shape: features explode from each document row, so map-side
  * partial aggregation collapses them back to ~one row per document
  * BEFORE the one doc-keyed shuffle; the weight lookup is a broadcast
  * left join (the table is ≤ numBuckets rows, and trained models are
  * sparse). No transcendentals: the output is the LOGIT — callers
  * threshold or rank, which is monotone in the sigmoid they'd otherwise
  * apply.
  */
object QualityModel {

  private def bucket(prefix: String, feature: Column, numBuckets: Int): Column =
    graft.functions.HashExprs.md5Mod(
      concat(lit(prefix), feature), 6, lit(numBuckets.toLong))

  /** Deterministic md5 stub weights over the full bucket space, centered
    * 24-bit integers in (−2^23, 2^23) scaled units — the test/oracle
    * stand-in for a trained model. */
  def hashWeights(spark: SparkSession, numBuckets: Int): DataFrame =
    spark.range(numBuckets.toLong).select(
      col("id").as("bucket"),
      (graft.functions.HashExprs.md5Long(
        concat(lit("qw"), col("id").cast("string")), 6) - lit(8388608L))
        .as("w_scaled"))

  /** Score documents: logit = (Σ w_scaled of hashed features / 1e6) /
    * n_feats. Features are all unigrams (each occurrence counts, bag
    * style) plus, when `useBigrams`, all bigrams. Docs with no features
    * get n_feats 0 and NULL logit (nothing to judge — callers decide).
    * Output: idCol, n_feats, logit_scaled, logit. */
  def score(
      df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, numBuckets: Int,
      useBigrams: Boolean = true): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val uni = transform(filter(toks, t => length(t) > 0),
      t => bucket("qf:", t, numBuckets))
    val feats =
      if (useBigrams)
        concat(uni, transform(Dedup.shingleArray(textCol, 2),
          s => bucket("qf2:", s, numBuckets)))
      else uni
    val perDoc = df.select(col(idCol), explode(feats).as("bucket"))
      .join(broadcast(weights.select(col("bucket"), col("w_scaled"))),
        Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_scaled"), lit(0L))).as("logit_scaled"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("logit_scaled"),
        ((col("logit_scaled").cast("double") / lit(1e6)) /
          col("n_feats").cast("double")).as("logit"))
  }
}
