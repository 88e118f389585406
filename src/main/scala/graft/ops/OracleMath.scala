package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine tie-stable rounding.
  *
  * `round(x, s)` diverges between engines when x lands exactly on (or within
  * one ulp of) a .5·10^-s tie: Spark rounds the shortest decimal repr
  * HALF_UP, DuckDB rounds the binary value — observed on a quality score of
  * exactly 0.31575 (Spark → 0.3158, DuckDB → 0.3157). Any rounded column
  * whose value is a ratio of integers (ratios, percentages, averages) can
  * hit this.
  *
  * Fix: implement the rounding ourselves in pure IEEE ops —
  * `floor(x·10^s + 0.5) / 10^s` — evaluated on the SAME double in both
  * engines, so every step is bit-identical regardless of either engine's
  * round() convention. (For decimal-exact values rounded at their own scale,
  * plain round is already a no-op and stays.)
  */
object OracleMath {
  def stableRound(c: Column, s: Int): Column = {
    val p = math.pow(10.0, s)
    if (s == 0) floor(c + lit(0.5)).cast("double")
    else floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)
  }

  /** SQL twin (DuckDB): keep the expression shape identical. */
  def stableRoundSql(expr: String, s: Int): String = {
    val p = math.pow(10.0, s)
    if (s == 0) s"CAST(floor(($expr) + 0.5) AS DOUBLE)"
    else s"CAST(floor(($expr) * $p + 0.5) AS DOUBLE) / $p"
  }

  /** Truncating integer division for SIGNED numerators (b > 0). The engines'
    * native integer divisions disagree on negatives — Spark's `DIV`
    * truncates toward zero, DuckDB's `//` floors — so any scaled-integer
    * algorithm whose values can go negative (eigenvector components,
    * centered moments) must spell the convention out: divide magnitudes,
    * reapply the sign. Both operands of the inner division are
    * non-negative, where the engines agree.
    */
  def tdiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{abs => cabs, call_function, when}
    when(a >= 0, call_function("div", a, b))
      .otherwise(-call_function("div", cabs(a), b))
  }

  /** DuckDB twin of [[tdiv]] (same magnitude-then-sign shape). */
  def tdivSql(a: String, b: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"
}
