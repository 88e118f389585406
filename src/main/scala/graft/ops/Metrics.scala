package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Runtime plan-metric aggregation — the library's observability surface
  * (the G5 "stats logging" concern, but measured from the executed plan
  * instead of printed): execute a frame, then fold a named SQL metric over
  * the final adaptive plan tree.
  *
  * Plan-shape assertions prove the optimizer CHOSE the right plan; these
  * prove the chosen plan BEHAVED — e.g. that a partial+final aggregate's
  * shuffle carried group rows rather than fact rows, or that a similarity
  * join's shuffles stayed skinny. The specs use them as regression guards:
  * an accidental `.distinct()` upstream or a dropped map-side combine shows
  * up as a shuffle-volume jump long before it shows up in wall-clock.
  */
object Metrics {
  /** Execute `df` and sum metric `key` across every node of the final plan
    * (descending through AQE wrapper nodes and materialized query stages).
    */
  def sumMetric(df: DataFrame, key: String): Long = {
    // Execute the audited frame WITHOUT shipping its rows to the driver: a
    // distributed no-op foreach over the same QueryExecution populates the
    // plan metrics even when the frame under audit is corpus-sized.
    df.queryExecution.toRdd.foreach(_ => ())
    def walk(p: SparkPlan): Long = {
      val self = p.metrics.get(key).map(_.value).getOrElse(0L)
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case _                        => 0L
      }
      self + nested + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  def shuffleRecordsWritten(df: DataFrame): Long = sumMetric(df, "shuffleRecordsWritten")
  def shuffleBytesWritten(df: DataFrame): Long = sumMetric(df, "shuffleBytesWritten")
}
