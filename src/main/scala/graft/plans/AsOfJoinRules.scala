package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through the custom [[AsOfJoinPlan]] node. Catalyst's
  * own `PushDownPredicates` only understands built-in nodes, so without this
  * rule a `Filter` above an as-of join blocks ALL scan pruning — at 100 TB
  * the difference between scanning a partition and scanning the table.
  *
  * Two semantics-preserving moves per conjunct:
  *
  *  1. **Left-only push**: a deterministic conjunct referencing only left
  *     attributes commutes with the join for both inner and outer variants
  *     (the join never alters left attributes, and dropping a left row drops
  *     exactly its output rows).
  *  2. **Key mirror**: a pushed `leftKey = lit` / `leftKey IN (lits)`
  *     conjunct is duplicated onto the corresponding RIGHT key. Every
  *     surviving left row has leftKey ∈ lits, and a right row can only match
  *     a left row with rightKey = leftKey, so right rows outside lits can
  *     never match — removable under inner and outer alike.
  *
  *  3. **Time upper-bound mirror**: a pushed `leftTime ≤ U` (or `< U`)
  *     conjunct implies `rightTime ≤ U` (resp. `< U`) for every right row
  *     that can match — the join is backward-looking (`rightTime ≤
  *     leftTime`), so a right row past U satisfies `rightTime > U ≥
  *     leftTime` against every surviving left row and was never a
  *     candidate; removing it cannot change which row is "latest ≤
  *     leftTime" for any survivor. LOWER bounds must NOT mirror: a right
  *     row before `leftTime ≥ L`'s cutoff can still be the latest match
  *     for a surviving left row.
  *
  * Right-only conjuncts must NOT push: filtering the right child changes
  * *which* right row is the latest-at-or-before candidate (post-join they
  * only drop already-matched rows), so they stay above the join.
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** `leftKey = lit` / `lit = leftKey` / `leftKey IN (lits)` mirrored onto
    * the positionally-matching right key.
    */
  private def mirror(j: AsOfJoinPlan, c: Expression): Option[Expression] = {
    def rightKeyFor(k: Expression): Option[Expression] =
      j.leftKeys.zipWithIndex.collectFirst {
        case (lk, i) if lk.semanticEquals(k) => j.rightKeys(i)
      }
    c match {
      case EqualTo(k, v: Literal) => rightKeyFor(k).map(EqualTo(_, v))
      case EqualTo(v: Literal, k) => rightKeyFor(k).map(EqualTo(_, v))
      case In(k, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        rightKeyFor(k).map(In(_, vs))
      case _ => None
    }
  }

  /** A pushed UPPER bound on the left time mirrored onto the right time
    * (backward mode: `rightTime ≤ leftTime ≤ U` ⇒ `rightTime ≤ U`). Strict
    * vs inclusive is preserved through the `rightTime ≤ leftTime`
    * inequality chain. NULL-time right rows: the mirrored filter drops
    * them (`NULL ≤ U` is not true), which is safe because
    * [[AsOfJoinExec]] itself never holds a NULL-time right row as a
    * candidate (SQL semantics: NULL never satisfies `rightTime ≤
    * leftTime`) — asserted by the NULL-time cases in GraftSpec.
    */
  private def timeMirror(j: AsOfJoinPlan, c: Expression): Option[Expression] = {
    def isT(e: Expression): Boolean = e.semanticEquals(j.leftTime)
    c match {
      case LessThanOrEqual(t, v: Literal) if isT(t)    => Some(LessThanOrEqual(j.rightTime, v))
      case LessThan(t, v: Literal) if isT(t)           => Some(LessThan(j.rightTime, v))
      case GreaterThan(v: Literal, t) if isT(t)        => Some(LessThan(j.rightTime, v))
      case GreaterThanOrEqual(v: Literal, t) if isT(t) => Some(LessThanOrEqual(j.rightTime, v))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (leftOnly, rest) = conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val mirrored = leftOnly.flatMap(mirror(j, _)) ++
          leftOnly.flatMap(timeMirror(j, _))
        val newLeft = Filter(leftOnly.reduce(And), j.left)
        val newRight =
          if (mirrored.isEmpty) j.right else Filter(mirrored.reduce(And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}
