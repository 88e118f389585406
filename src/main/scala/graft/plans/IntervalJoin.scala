package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Broadcast MERGE interval join: every left "point" row joins every right
  * interval row with `start ≤ t < end` — the second whole-operator extension
  * (SURVEY §7.4 path c) reusing the [[AsOfJoinPlan]] scaffolding
  * (LogicalPlan + Strategy + Exec via `SparkSessionExtensions` /
  * `experimental.extraStrategies`).
  *
  * Why an operator instead of the q64 composable encodings:
  *
  *  - the **bin-explode** encoding (q64: explode each interval to its
  *    covering bins, equi-join on bin + residual range filter) amplifies
  *    interval rows by their bin span and re-tests the residual per
  *    candidate — with DENSE ranges (every point hits an interval, intervals
  *    abut) the amplification and the per-row CASE work are pure overhead;
  *  - a **BroadcastNestedLoopJoin** tests every point against every interval
  *    (points × intervals comparisons).
  *
  * This exec instead requires only a per-partition LOCAL sort of the point
  * side by time (EnsureRequirements adds the Sort; NO exchange — the point
  * side keeps its partitioning, at 100 TB nothing corpus-sized moves) and a
  * broadcast of the interval side, sorted once by start per partition. One
  * forward sweep per partition keeps the ACTIVE interval set (started, not
  * yet ended) — the q114 sweep-line as a physical operator: O(|points| +
  * |intervals| + |matches|) comparisons, zero row amplification, state
  * bounded by the maximum interval overlap degree (1 for the dense abutting
  * case). Overlapping intervals are fully supported (each match emitted).
  *
  * Inner semantics: points in no interval are dropped (q64's shape).
  */
case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, t, s, e) =>
      IntervalJoinExec(t, s, e, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // point side: keep whatever partitioning it has (no exchange — only the
  // in-partition time sort below); interval side: broadcast as-is
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftTime, Ascending)), Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = Seq(SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lTime = leftTime
    val rStart = rightStart
    val rEnd = rightEnd
    left.execute().mapPartitions({ lIter =>
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val lT = UnsafeProjection.create(Seq(lTime), lOut)
      val sP = UnsafeProjection.create(Seq(rStart), rOut)
      val eP = UnsafeProjection.create(Seq(rEnd), rOut)
      // materialize (start, end, row) once per partition; drop null-bounded
      // intervals; sort by start so the sweep consumes them in one pass
      val ivs: Array[(UnsafeRow, UnsafeRow, InternalRow)] = bc.value.iterator
        .map(r => (sP(r).copy(), eP(r).copy(), r))
        .filterNot { case (s, e, _) => s.isNullAt(0) || e.isNullAt(0) }
        .toArray
        .sortWith((a, b) => tOrd.compare(a._1, b._1) < 0)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val active = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow, InternalRow)]

      new Iterator[InternalRow] {
        private var ptr = 0
        private var lRow: InternalRow = _
        private var matchIdx = 0

        private def advanceLeft(): Boolean = {
          while (lIter.hasNext) {
            lRow = lIter.next()
            val t = lT(lRow)
            if (!t.isNullAt(0)) {
              // admit intervals that have started; retire those that ended
              while (ptr < ivs.length && tOrd.compare(ivs(ptr)._1, t) <= 0) {
                active += ivs(ptr); ptr += 1
              }
              var i = 0
              while (i < active.length) {
                if (tOrd.compare(t, active(i)._2) >= 0) active.remove(i) else i += 1
              }
              if (active.nonEmpty) { matchIdx = 0; return true }
            }
          }
          false
        }

        override def hasNext: Boolean =
          (lRow != null && matchIdx < active.length) || advanceLeft()

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = outProj(joined(lRow, active(matchIdx)._3))
          matchIdx += 1
          if (matchIdx >= active.length) lRow = null
          out
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the broadcast merge interval join. */
object IntervalJoin {
  /** Installs [[IntervalJoinStrategy]] on the session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy

  /** `points INTERVAL JOIN intervals ON start <= t AND t < end` (inner).
    * The interval side must be broadcast-sized; the point side never
    * shuffles. The caller must ensure the two plans share no attribute ids.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: Column, start: Column, end: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val spark = points.sparkSession
    install(spark)
    val plan = IntervalJoinPlan(
      points.queryExecution.analyzed, intervals.queryExecution.analyzed,
      GraftSqlBridge.expression(pointTime),
      GraftSqlBridge.expression(start), GraftSqlBridge.expression(end))
    GraftSqlBridge.ofRows(spark, plan)
  }
}
