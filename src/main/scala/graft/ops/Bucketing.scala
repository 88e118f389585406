package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact⋈fact joins: writing both sides
  * bucketed (and sorted) by the join key lets the sort-merge join read
  * matching buckets directly — no Exchange on either side, the single
  * biggest shuffle eliminated at 100 TB (a lineitem⋈orders join moves zero
  * bytes between executors instead of both tables).
  *
  * This is the persistent-layout counterpart of `repartition`: pay the
  * bucketing once at ingest, reuse it across every downstream join/agg on
  * that key. Asserted shuffle-free in the test suite.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans as a sort-merge
    * join with no Exchange when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) === org.apache.spark.sql.functions.col(rightKey))
}
