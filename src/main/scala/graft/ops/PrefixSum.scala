package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass distributed global prefix sums — the scale-safe replacement for
  * an unpartitioned `Window.orderBy(...)`, which collapses the whole input
  * into ONE task (the classic 100 TB plan killer: a single-executor sort of
  * the full table). The pattern was proven by q102's sequence packing
  * ([[TextOps.packSequences]]) and is promoted here so the exact-rank
  * statistics family (q223 deciles, q233 KS, q234 Mann-Whitney, q235 RFM
  * ntiles) shares one implementation:
  *
  *   1. range-partition the input on the order keys (RangePartitioner
  *      samples boundaries — fully parallel, preserves global order across
  *      partitions);
  *   2. per-partition totals for every summed column — ONE row per partition
  *      collected to the driver (n_partitions rows, never data);
  *   3. exclusive per-partition offsets broadcast back as a literal CASE
  *      chain, added to a partition-LOCAL cumulative window.
  *
  * Every pass is fully parallel; the only sequential state is the
  * n_partitions-row offset table. Grand totals fall out of the same collect
  * for free and are returned as driver values, so callers never need a
  * `count(*) OVER ()` whole-input window either.
  *
  * The partitioned view is persisted before the offsets are collected so both
  * passes observe the SAME sampled range boundaries (RangePartitioner samples
  * its bounds; collect-then-recompute could see a different partitioning).
  *
  * Correctness requires the order keys to form a UNIQUE total order (ties
  * split across a range-partition boundary would otherwise split a peer
  * group). All callers order by a distinct grouped value or tie-break on a
  * primary key.
  */
object PrefixSum {

  /** Result of [[cumSums]]: the input rows plus one inclusive running-sum
    * column `cum_<name>` per requested sum, and the driver-side grand total
    * per sum (exact Longs — they came from the same per-partition totals the
    * offsets did).
    */
  final case class CumResult(df: DataFrame, totals: Map[String, Long])

  /** Attach inclusive global running sums over `orderCols` to `df`.
    *
    * @param sums (name, longColumn) pairs; the output gains `cum_<name>`
    *             for each. Pass `lit(1L)` to get a global row number.
    */
  def cumSums(df: DataFrame, orderCols: Seq[Column],
              sums: Seq[(String, Column)], nParts: Int): CumResult = {
    import org.apache.spark.storage.StorageLevel
    val pidCol = "__ps_pid"
    val valCols = sums.map { case (n, c) => c.cast("long").as(s"__ps_v_$n") }
    val parts = df
      .select(col("*") +: valCols: _*)
      .repartitionByRange(nParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val aggCols = sums.map { case (n, _) => sum(col(s"__ps_v_$n")).as(n) }
    val totalRows = parts.groupBy(col(pidCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy(col(pidCol))
      .collect()
    val pids = totalRows.map(_.getInt(0))
    // offsets(n)(i) = exclusive prefix (sum over all earlier partitions);
    // scanLeft yields pids.length+1 entries, zip truncates to the exclusive ones
    val offsets: Map[String, Array[(Int, Long)]] = sums.zipWithIndex.map {
      case ((n, _), i) =>
        val perPart = totalRows.map(_.getLong(i + 1))
        n -> pids.zip(perPart.scanLeft(0L)(_ + _))
    }.toMap
    val totals: Map[String, Long] = sums.zipWithIndex.map { case ((n, _), i) =>
      n -> totalRows.map(_.getLong(i + 1)).sum
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidCol))
      .orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withCums = sums.foldLeft(parts.toDF()) { case (acc, (n, _)) =>
      val offsetCol = offsets(n).foldLeft(lit(0L)) { case (accc, (pid, off)) =>
        when(col(pidCol) === pid, lit(off)).otherwise(accc)
      }
      acc.withColumn(s"cum_$n", sum(col(s"__ps_v_$n")).over(w) + offsetCol)
    }
    val cleaned = withCums.drop(pidCol).drop(sums.map(s => s"__ps_v_${s._1}"): _*)
    CumResult(cleaned, totals)
  }

  /** Default partition count for the range pass, matching packSequences. */
  def defaultParts(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(2, spark.sparkContext.defaultParallelism / 4)
}
