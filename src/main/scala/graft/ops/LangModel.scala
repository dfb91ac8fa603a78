package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style "LM
  * quality filter" step of a training-data pipeline: train a bigram
  * model on a corpus, score every document by how natural its token
  * transitions are under that model, filter/stratify on the score.
  *
  * Engine-portable by construction: P(w2|w1) = n(w1,w2) / n(w1,·) is a
  * ratio of two longs (one exactly-rounded IEEE division, identical in
  * any engine), and the per-document score is the MEAN conditional
  * probability of its bigram occurrences, reduced with the exact scaled
  * sum ([[graft.ExactAgg]]). Log-perplexity is deliberately avoided:
  * exp/log differ in the last ulp across libm implementations, while
  * mean-of-ratios is bit-reproducible; the filtering step consumes rank
  * order, which the mean preserves (higher = more natural).
  *
  * Scale shape: training is one hash aggregate over bigram types + one
  * window partitioned by first token (types, not occurrences); scoring
  * is a bigram-keyed equi-join — linear in total token count, never
  * doc×vocab — plus one per-document aggregate. No driver state.
  */
object LangModel {

  /** Bigram LM trained on `textCol`: one row per bigram type with
    * (bg, n, cond_p) where bg is the space-joined bigram, n its corpus
    * occurrence count, and cond_p = P(second | first). */
  def bigramModel(df: DataFrame, textCol: String): DataFrame = {
    val bi = df.select(explode(Dedup.shingleArray(textCol, 2)).as("bg"))
    val w1 = element_at(split(col("bg"), " "), 1)
    bi.groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .withColumn("cond_p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(w1)).cast("double"))
  }

  /** Score documents under a [[bigramModel]]: the mean conditional
    * probability over the document's bigram occurrences (duplicates
    * count — a repeated transition is repeated evidence). Bigrams absent
    * from the model score 0 (only possible when scoring a different
    * corpus than the model was trained on). Documents with fewer than
    * two tokens have no bigrams: n_bigrams 0, lm_score null.
    *
    * Returns (idCol, n_bigrams, lm_score). */
  def scoreDocuments(
      df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val docBi = df.select(col(idCol),
      explode(Dedup.shingleArray(textCol, 2)).as("bg"))
    val scored = docBi
      .join(model.select(col("bg"), col("cond_p")), Seq("bg"), "left")
      .withColumn("cond_p", coalesce(col("cond_p"), lit(0.0)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.ExactAgg.davg(col("cond_p")).as("lm_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }
}
