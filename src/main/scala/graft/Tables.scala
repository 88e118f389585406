package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md §2).
  *
  * Parquet is self-describing, so no inference happens on these paths; the one
  * normalization we do is `events.ts`, which is written as parquet
  * TIMESTAMP(NANOS) — Spark's `TimestampType` is microsecond-precision, so we
  * read nanos as a long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate
  * to micros explicitly. FIXTURES.md caveats: never compare raw nanos with an
  * oracle; aggregate or `date_trunc` first.
  *
  * At 100 TB these would be partitioned/bucketed parquet directories instead of
  * single files; the loaders take a base dir so the same code runs on any
  * scale factor (or an `s3a://` prefix on a real cluster).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** `events` with `ts` as a proper (micro-truncated) TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(spark, dir, "events")
    // nanos since epoch (long) -> micros -> TimestampType. Integer DIV, not
    // `/`: Spark's `/` on longs is double division, and 2024-epoch nanos
    // (~1.7e18) exceed double's 53-bit mantissa — truncating the quotient
    // can land up to ~256 ns off, i.e. occasionally in the WRONG microsecond,
    // which breaks raw-ts comparisons against engines that truncate exactly.
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
  }
}
