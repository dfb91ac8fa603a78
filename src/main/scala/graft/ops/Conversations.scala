package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-turn conversation handling for instruction-tuning data prep:
  * chat corpora arrive as JSON turn arrays (role/content), and the
  * pipeline needs them flattened to per-turn rows for token counting,
  * role-structure validation, and per-turn quality filters.
  *
  * Ref behavior: the reference's JSON surface stops at scalar
  * extraction (polars_utils.py); structured turn arrays are part of the
  * extended LLM-pipeline layer (builder brief).
  *
  * Both operators are per-conversation local: `from_json` + generator
  * explode is a pure map stage fused into the scan, and the only window
  * partitions by conversation id — bounded by a single conversation's
  * turn count, never corpus-shaped (same per-doc bound as every
  * tokenizer stage).
  */
object Conversations {

  /** The turn-array schema: [{"role": ..., "content": ...}, ...]. */
  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** One row per conversation turn, in array order. Conversations whose
    * JSON fails to parse (or is NULL / an empty array) still emit ONE
    * row with a NULL turn_idx — malformed input stays visible for the
    * caller to route, never silently vanishes (posexplode_outer).
    *
    * Output: idCol, turn_idx (0-based), role, content, n_tokens
    * (whitespace tokens of the normalized content). */
  def flatten(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol),
      posexplode_outer(from_json(col(jsonCol), turnSchema))
        .as(Seq("turn_idx", "__t")))
      .select(col(idCol), col("turn_idx"),
        col("__t.role").as("role"), col("__t.content").as("content"),
        TextOps.tokenCount(col("__t.content")).cast("long").as("n_tokens"))

  /** Per-conversation structure report: turn counts by role, total
    * content tokens, and whether roles strictly alternate (no two
    * consecutive turns with the same role — the well-formedness check
    * chat-format training data is gated on). Unparseable/empty
    * conversations report 0 turns and alternation_ok = false (a
    * conversation with no turns is not trainable chat data).
    *
    * Output: idCol, n_turns, n_user, n_assistant, total_tokens,
    * alternation_ok. */
  def stats(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
    flatten(df, idCol, jsonCol)
      .withColumn("__prev", lag(col("role"), 1).over(w))
      .groupBy(col(idCol))
      .agg(count(col("turn_idx")).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
        (count(col("turn_idx")) > 0 &&
          sum(when(col("role") <=> col("__prev"), 1L).otherwise(0L)) === 0L)
          .as("alternation_ok"))
  }
}
