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

  /** Build the (bucket, w_scaled) table [[score]] consumes from a
    * TRAINED (feature, weight) vocabulary — the production loading
    * seam: a fastText/CCNet-style model ships as feature strings with
    * float weights; this maps unigram features through the same hash
    * as score's unigrams and space-joined bigrams ("a b") through its
    * bigram hash, scaling weights to exact 1e6-unit longs. Features
    * that collide in the bucket space SUM — the hashing-trick
    * semantics the classifier was trained under. The result is sparse
    * (≤ vocab-size rows): unmatched buckets weigh 0 via score's left
    * join, so a 10^5-feature model stays broadcast-sized however large
    * `numBuckets` is. */
  def weightTable(
      vocab: DataFrame, featureCol: String, weightCol: String,
      numBuckets: Int): DataFrame =
    vocab.select(
      when(col(featureCol).contains(" "),
        bucket("qf2:", col(featureCol), numBuckets))
        .otherwise(bucket("qf:", col(featureCol), numBuckets)).as("bucket"),
      (col(weightCol).cast("double") * lit(1e6)).cast("long").as("w_scaled"))
      .groupBy(col("bucket"))
      .agg(sum(col("w_scaled")).as("w_scaled"))

  /** The shared hashed feature set: every unigram occurrence (bag
    * style) plus every bigram, in the [[score]] bucket space. */
  private def featureBuckets(textCol: String, numBuckets: Int): Column = {
    val toks = TextOps.tokens(col(textCol))
    concat(
      transform(filter(toks, t => length(t) > 0),
        t => bucket("qf:", t, numBuckets)),
      transform(Dedup.shingleArray(textCol, 2),
        s => bucket("qf2:", s, numBuckets)))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): learn per-bucket
    * contrast weights from the corpus ITSELF — a target subset (the
    * distribution you want more of) against the raw corpus — then score
    * every document by how target-like its hashed n-gram profile is.
    * Complements [[score]], whose weights arrive trained from outside.
    *
    * All arithmetic integer-exact (no libm log — [[LangModel]]'s
    * reasoning): with c_t(b)/c_r(b) = feature occurrences in
    * target/raw docs hashing to bucket b, and B = numBuckets,
    *   s_x(b) = (c_x(b)+1)·scale div (tot_x + B)   (add-1 smoothing)
    *   w(b)   = s_t(b) − s_r(b)
    *   score  = Σ_{doc features} w(bucket)  — exact long sum.
    * The additive form is the linear-classifier reading of the
    * log-likelihood-ratio product; same ranking role, engine-exact.
    * Headroom: (c+1)·scale < 2^63 → ≲9.2e12 occurrences per bucket at
    * the 1e6 default.
    *
    * Scale shape: one feature explode feeding TWO bucket-keyed
    * aggregates (raw + conditional target counts in one pass, map-side
    * absorbed); totals ride back as a one-row broadcast cross join; the
    * weight table is ≤ B rows, broadcast into the per-doc sum. A NULL
    * `isTarget` counts as non-target (no evidence). Docs with no
    * features keep n_feats 0 and NULL score (nothing to judge).
    *
    * Output: idCol, n_feats, score_scaled. */
  def importanceScore(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      numBuckets: Int = 512, scale: Long = 1000000L): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(scale > 0L, "scale must be positive")
    val exploded = df.select(col(idCol), isTarget.as("__t"),
      explode(featureBuckets(textCol, numBuckets)).as("bucket"))
    val stats = exploded.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_t"))
    val tots = stats.agg(sum(col("c_r")).as("tot_r"), sum(col("c_t")).as("tot_t"))
    val w = stats.crossJoin(broadcast(tots)).select(col("bucket"),
      (expr(s"((c_t + 1L) * ${scale}L) div (tot_t + ${numBuckets}L)") -
        expr(s"((c_r + 1L) * ${scale}L) div (tot_r + ${numBuckets}L)"))
        .as("w_scaled"))
    val perDoc = exploded.join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_scaled")).as("score_scaled"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("score_scaled"))
  }

  /** Score documents: logit = (Σ w_scaled of hashed features / 1e6) /
    * n_feats. Features are all unigrams (each occurrence counts, bag
    * style) plus, when `useBigrams`, all bigrams. Docs with no features
    * get n_feats 0 and NULL logit (nothing to judge — callers decide).
    * Output: idCol, n_feats, logit_scaled, logit. */
  def score(
      df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, numBuckets: Int,
      useBigrams: Boolean = true): DataFrame = {
    val feats =
      if (useBigrams) featureBuckets(textCol, numBuckets)
      else transform(
        filter(TextOps.tokens(col(textCol)), t => length(t) > 0),
        t => bucket("qf:", t, numBuckets))
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
