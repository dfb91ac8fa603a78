package graft.model

import java.time.LocalDate

/** Date-range backfill for incremental models — the Spark re-expression
  * of the reference's BackfillExecutor (src/framework/backfill.py:26-85):
  * split [start, end] into fixed-day intervals and execute the model once
  * per interval with `$start_date`/`$end_date` bound.
  */
object Backfill {

  final case class Interval(start: LocalDate, end: LocalDate) {
    def variables: Map[String, String] =
      Map("start_date" -> start.toString, "end_date" -> end.toString)
  }

  /** Inclusive date chunks, `intervalDays` wide (backfill.py:52-77). */
  def intervals(start: LocalDate, end: LocalDate, intervalDays: Int): Seq[Interval] = {
    require(intervalDays > 0, "intervalDays must be positive")
    Iterator.iterate(start)(_.plusDays(intervalDays.toLong + 1))
      .takeWhile(!_.isAfter(end))
      .map { s =>
        val e = s.plusDays(intervalDays.toLong)
        Interval(s, if (e.isAfter(end)) end else e)
      }.toSeq
  }

  /** Run the model over the chunked date range.
    *
    * APPEND-strategy chunks are independent by construction (each
    * selects a disjoint date slice; no merge reads prior chunks), so
    * they FUSE: every chunk's rendered plan unions into one frame and
    * materializes with a single write — Catalyst runs the chunk scans
    * in parallel instead of N sequential write round-trips. The
    * reference runs chunks serially (backfill.py:26-85) only because
    * per-statement warehouse DML forced it. Fusion requires the model
    * to be genuinely chunk-independent: no pre/post hooks (hooks render
    * per-chunk variables and may be stateful) and an
    * [[ModelRunner.incrementalInvariant]] body (no is_incremental()
    * branch, whose rendering depends on chunk order). The fused path
    * returns ONE result for the whole range.
    *
    * Every other strategy keeps the serial loop: time-watermark and
    * unique-key merges read state left by earlier chunks — order IS
    * their semantics. */
  def run(
      runner: ModelRunner,
      model: String,
      start: LocalDate,
      end: LocalDate,
      intervalDays: Int = 1,
      variables: Map[String, String] = Map.empty): Seq[MaterializeResult] = {
    val ivs = intervals(start, end, intervalDays)
    val cfg = runner.config(model)
    val fusible = ivs.size > 1 &&
      cfg.materialized == "incremental" &&
      cfg.incrementalStrategy.contains("append") &&
      cfg.preHooks.isEmpty && cfg.postHooks.isEmpty &&
      ivs.forall(iv => runner.incrementalInvariant(model, variables ++ iv.variables))
    if (fusible)
      Seq(runner.executeModelBatch(model, ivs.map(variables ++ _.variables)))
    else ivs.map(iv => runner.executeModel(model, variables ++ iv.variables))
  }
}
