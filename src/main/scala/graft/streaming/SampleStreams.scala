package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sampling operators — the live twins of [[graft.ops.Sampling]].
  */
object SampleStreams {

  final case class Keyed(stratum: String, id: Long, ord: Long)

  /** Per-stratum reservoir: row count absorbed so far + the current
    * bottom-`quota` (ord, id) entries — CONSTANT size per stratum, the
    * bounded-state discipline every stateful operator here keeps. */
  final case class Reservoir(nSeen: Long, ords: Seq[Long], ids: Seq[Long])

  /** STREAMING per-stratum quota sampling — the live twin of
    * [[graft.ops.Sampling.quotaSample]] (C84): maintain, per stratum,
    * the `quota` documents with the SMALLEST deterministic priorities
    * (md5("qsamp:" + id), the identical 52-bit draw the batch operator
    * ranks by), as the corpus streams past. Deterministic priorities
    * make the reservoir a pure set function of the rows seen — unlike
    * classic RNG reservoir sampling, the streamed sample is EXACTLY
    * the batch sample over the same rows, for any batch split, which
    * is what lets the same DuckDB oracle pin both.
    *
    * State per stratum is the (ord, id) bottom-k plus a seen-count —
    * constant bytes, never row retention. A stratum emits its full
    * reservoir snapshot (tagged with n_seen) whenever a micro-batch
    * CHANGES it; the current sample is therefore the latest (max
    * n_seen) emission per stratum, and a single-batch AvailableNow run
    * emits exactly the batch operator's result. Rows with a NULL id
    * are excluded (no identity → no stable priority); a NULL stratum
    * is a legitimate group, matching the batch operator.
    *
    * Output rows: (stratum, n_seen, rank, id) — rank 1-based in
    * (ord, id) order, the batch operator's exact tie-break. */
  def quotaStream(
      df: DataFrame, idCol: String, stratumCol: String,
      quota: Int): Dataset[(String, Long, Int, Long)] = {
    import df.sparkSession.implicits._
    require(quota > 0, "quota must be positive")
    val keyed = df.filter(col(idCol).isNotNull)
      .select(col(stratumCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"),
        graft.functions.HashExprs.md5Long(
          concat(lit("qsamp:"), col(idCol).cast("string")), 13).as("ord"))
      .as[Keyed]

    keyed.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(quotaUpdate(quota))
  }

  /** The per-group state transition, exposed for direct unit testing
    * with Spark's `TestGroupState` (cross-batch carry is asserted at
    * this level; the engine's state-store recovery machinery itself is
    * pinned by the sessionizer/funnel/transition restart specs). */
  private[streaming] def quotaUpdate(quota: Int)(
      stratum: String, rows: Iterator[Keyed],
      state: GroupState[Reservoir]): Iterator[(String, Long, Int, Long)] = {
    val prev = state.getOption.getOrElse(Reservoir(0L, Seq.empty, Seq.empty))
    var n = prev.nSeen
    var res = prev.ords.zip(prev.ids)
    rows.foreach { r =>
      n += 1
      // bounded insert: k is small, a per-row sort of <= k+1 entries
      res = ((r.ord, r.id) +: res).sorted.take(quota)
    }
    state.update(Reservoir(n, res.map(_._1), res.map(_._2)))
    if (res == prev.ords.zip(prev.ids)) Iterator.empty
    else res.iterator.zipWithIndex.map { case ((_, id), i) =>
      (stratum, n, i + 1, id)
    }
  }
}
