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

  /** Run the model once per interval (appends accumulate in the
    * warehouse). Sequential by design: intervals of one model are
    * ordered; parallelism lives inside each Spark job. */
  def run(
      runner: ModelRunner,
      model: String,
      start: LocalDate,
      end: LocalDate,
      intervalDays: Int = 1,
      variables: Map[String, String] = Map.empty): Seq[MaterializeResult] =
    intervals(start, end, intervalDays).map { iv =>
      runner.executeModel(model, variables ++ iv.variables)
    }
}
