package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** MERGE interval join: every left "point" row joins every right interval
  * row with `start ≤ t < end` (equi-keys optional, inner or left-outer) —
  * the second whole-operator extension (SURVEY §7.4 path c) reusing the
  * [[AsOfJoinPlan]] scaffolding (LogicalPlan + Strategy + Exec via
  * `SparkSessionExtensions` / `experimental.extraStrategies`).
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
  * Two physical modes, chosen by whether equi-keys are given:
  *
  *  - **Broadcast (keyless)**: the point side needs only a per-partition
  *    LOCAL sort by time (EnsureRequirements adds the Sort; NO exchange —
  *    the point side keeps its partitioning, at 100 TB nothing corpus-sized
  *    moves) and the interval side is broadcast, sorted once by start per
  *    partition. Interval side must be broadcast-sized.
  *  - **Keyed (SortMergeJoin's contract)**: both sides hash-cluster on the
  *    equi-keys and sort by (keys, time) / (keys, start); a single forward
  *    merge pass pairs each point group with its key's interval set. This
  *    removes the broadcast-size ceiling — a fact-sized interval table
  *    (e.g. q113's per-customer SCD2 validity windows) shuffles once on its
  *    key like any big join side, and per-key interval sets bound the
  *    in-memory state (SCD2: the key's version count).
  *
  * Either mode sweeps forward keeping the ACTIVE interval set (started, not
  * yet ended) — the q114 sweep-line as a physical operator: O(|points| +
  * |intervals| + |matches|) comparisons, zero row amplification, state
  * bounded by the maximum interval overlap degree (1 for abutting validity
  * windows). Overlapping intervals are fully supported (each match emitted).
  *
  * Join semantics: inner drops points in no interval (q64's shape);
  * `outer = true` keeps them with nulls on the right (and a NULL point time
  * also outer-emits). Null-bounded intervals never match. Like the as-of
  * operator, equi-key matching uses the natural ordering, so NULL keys
  * group together — callers with nullable keys filter them first.
  */
case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    outer: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, t, s, e, o) =>
      IntervalJoinExec(lk, rk, t, s, e, o, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    outer: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def keyed: Boolean = leftKeys.nonEmpty

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // keyless: point side keeps whatever partitioning it has (no exchange —
  // only the in-partition time sort below), interval side broadcast as-is;
  // keyed: SortMergeJoin's co-clustering contract on the equi-keys
  override def requiredChildDistribution: Seq[Distribution] =
    if (keyed) ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
    else UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (keyed) Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))
    else Seq(Seq(SortOrder(leftTime, Ascending)), Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] =
    if (keyed) doExecuteKeyed() else doExecuteBroadcast()

  /** Shared per-partition sweep state machine: consume time-ordered point
    * rows against a start-ordered interval array, keeping the active set.
    * Used with the whole broadcast interval array (keyless) or one key
    * group's intervals (keyed — the caller swaps `ivs` per group).
    */
  private final class Sweep(tOrd: Ordering[InternalRow]) {
    var ivs: Array[(UnsafeRow, UnsafeRow, InternalRow)] = Array.empty
    var ptr = 0
    val active = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow, InternalRow)]

    def reset(intervals: Array[(UnsafeRow, UnsafeRow, InternalRow)]): Unit = {
      ivs = intervals; ptr = 0; active.clear()
    }

    /** Advance the active set to point time `t` (admit started, retire
      * ended); the resulting `active` is the match set for `t`.
      */
    def advanceTo(t: UnsafeRow): Unit = {
      while (ptr < ivs.length && tOrd.compare(ivs(ptr)._1, t) <= 0) {
        active += ivs(ptr); ptr += 1
      }
      var i = 0
      while (i < active.length) {
        if (tOrd.compare(t, active(i)._2) >= 0) active.remove(i) else i += 1
      }
    }
  }

  /** Emission state machine shared by both modes: after [[Sweep.advanceTo]],
    * either the active set's rows (matchIdx walks it) or — outer only — one
    * null-padded row (matchIdx == -1).
    */
  private def emitIterator(
      lIter: Iterator[InternalRow],
      lOut: Seq[Attribute], rOut: Seq[Attribute],
      lT: UnsafeProjection,
      sweep: Sweep,
      onNewLeftRow: InternalRow => Boolean): Iterator[InternalRow] = {
    val joined = new JoinedRow
    // outer: bind against a NULLABLE view of the right attributes — binding
    // takes nullability from the INPUT schema, and a non-nullable right
    // column would codegen without a null check and read garbage from the
    // null-padded row
    val outProj = UnsafeProjection.create(output,
      if (outer) lOut ++ rOut.map(_.withNullability(true)) else lOut ++ rOut)
    val nullRight = InternalRow.fromSeq(Seq.fill(rOut.length)(null))
    val emitUnmatched = outer

    new Iterator[InternalRow] {
      private var lRow: InternalRow = _
      private var matchIdx = 0

      private def advanceLeft(): Boolean = {
        while (lIter.hasNext) {
          lRow = lIter.next()
          // keyed mode hook: (re)load this row's key group; false = the row
          // cannot match (no interval group) — outer-emit or skip
          val groupOk = onNewLeftRow(lRow)
          val t = lT(lRow)
          if (groupOk && !t.isNullAt(0)) {
            sweep.advanceTo(t)
            if (sweep.active.nonEmpty) { matchIdx = 0; return true }
            else if (emitUnmatched) { matchIdx = -1; return true }
          } else if (emitUnmatched) { matchIdx = -1; return true }
        }
        false
      }

      override def hasNext: Boolean =
        (lRow != null && (matchIdx == -1 || matchIdx < sweep.active.length)) || advanceLeft()

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        if (matchIdx == -1) {
          val out = outProj(joined(lRow, nullRight))
          lRow = null
          out
        } else {
          val out = outProj(joined(lRow, sweep.active(matchIdx)._3))
          matchIdx += 1
          if (matchIdx >= sweep.active.length) lRow = null
          out
        }
      }
    }
  }

  private def doExecuteBroadcast(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
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
      val sweep = new Sweep(tOrd)
      sweep.reset(ivs)
      emitIterator(lIter, lOut, rOut, lT, sweep, _ => true)
    }, preservesPartitioning = true)
  }

  private def doExecuteKeyed(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rStart = rightStart
    val rEnd = rightEnd
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lT = UnsafeProjection.create(Seq(lTime), lOut)
      val lK = UnsafeProjection.create(lKeys, lOut)
      val rK = UnsafeProjection.create(rKeys, rOut)
      val sP = UnsafeProjection.create(Seq(rStart), rOut)
      val eP = UnsafeProjection.create(Seq(rEnd), rOut)
      val rBuf = rIter.buffered
      val sweep = new Sweep(tOrd)
      var curKey: UnsafeRow = null

      // both inputs arrive (keys, time)-sorted, so each key's interval group
      // is a contiguous run consumed exactly once: skip runs before the
      // point's key, load the equal-key run (already start-sorted), sweep.
      // Per-key state = that key's interval count (SCD2: its version count).
      def loadGroup(lRow: InternalRow): Boolean = {
        val k = lK(lRow)
        if (curKey != null && keyOrd.compare(k, curKey) == 0) return sweep.ivs.nonEmpty
        curKey = k.copy()
        while (rBuf.hasNext && keyOrd.compare(rK(rBuf.head), curKey) < 0) rBuf.next()
        val grp = scala.collection.mutable.ArrayBuffer.empty[(UnsafeRow, UnsafeRow, InternalRow)]
        while (rBuf.hasNext && keyOrd.compare(rK(rBuf.head), curKey) == 0) {
          val r = rBuf.next()
          val s = sP(r).copy(); val e = eP(r).copy()
          if (!s.isNullAt(0) && !e.isNullAt(0)) grp += ((s, e, r.copy()))
        }
        sweep.reset(grp.toArray)
        sweep.ivs.nonEmpty
      }

      emitIterator(lIter, lOut, rOut, lT, sweep, loadGroup)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the merge interval join. */
object IntervalJoin {
  /** Installs [[IntervalJoinStrategy]] on the session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy

  /** `points INTERVAL JOIN intervals ON start <= t AND t < end` (inner,
    * keyless — the interval side must be broadcast-sized; the point side
    * never shuffles). The caller must ensure the two plans share no
    * attribute ids.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: Column, start: Column, end: Column): DataFrame =
    join(points, intervals, Nil, Nil, pointTime, start, end, outer = false)

  /** Full form: `points [LEFT] INTERVAL JOIN intervals ON lk = rk AND
    * start <= t < end`. With keys, both sides hash-cluster (SortMergeJoin's
    * contract — no broadcast-size ceiling); keyless requires the interval
    * side broadcast-sized. `outer = true` keeps unmatched points with nulls
    * on the right.
    */
  def join(points: DataFrame, intervals: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           pointTime: Column, start: Column, end: Column,
           outer: Boolean): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val spark = points.sparkSession
    install(spark)
    val tExpr = GraftSqlBridge.expression(pointTime)
    val sExpr = GraftSqlBridge.expression(start)
    val eExpr = GraftSqlBridge.expression(end)
    val lkExprs = leftKeys.map(GraftSqlBridge.expression)
    val rkExprs = rightKeys.map(GraftSqlBridge.expression)
    // The exec compares t/start/end (and key pairs) with orderings built
    // from the left types, and analysis is bypassed (no implicit coercion),
    // so a type mismatch would be an undiagnosed raw-bits comparison — e.g.
    // NTZ micros vs LTZ micros is only right in a UTC session, and date
    // (Int days) vs timestamp (Long micros) is garbage. Fail fast instead;
    // the caller casts explicitly (see intervalJoinMonthly's
    // timestamp_ntz casts).
    val types = Seq(tExpr, sExpr, eExpr).map(_.dataType)
    require(types.distinct.size == 1,
      s"interval join requires one shared time type; got point=${types(0)}, " +
        s"start=${types(1)}, end=${types(2)} — cast the columns explicitly")
    require(lkExprs.length == rkExprs.length,
      s"interval join key arity mismatch: ${lkExprs.length} vs ${rkExprs.length}")
    lkExprs.zip(rkExprs).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"interval join key type mismatch: ${l.dataType} vs ${r.dataType} — " +
          "cast the columns explicitly")
    }
    val plan = IntervalJoinPlan(
      points.queryExecution.analyzed, intervals.queryExecution.analyzed,
      lkExprs, rkExprs, tExpr, sExpr, eExpr, outer)
    GraftSqlBridge.ofRows(spark, plan)
  }
}
