package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md §2).
  *
  * Parquet is self-describing, so no inference happens on these paths; the one
  * normalization we do is `events.ts`, whose physical encoding has drifted
  * across environments (parquet TIMESTAMP(NANOS) in one, timestamp[us]
  * without UTC adjustment — Spark's TIMESTAMP_NTZ — in another). The decode
  * is therefore SCHEMA-ADAPTIVE: branch on the resolved Spark type, not on a
  * session conf, so the same jar reads any vintage of the data correctly.
  * All paths land on the same micro-truncated `TimestampType` (session TZ is
  * UTC everywhere, so NTZ naive micros and LTZ UTC micros coincide — the
  * same interpretation DuckDB's naive timestamps give the oracle).
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

  /** `events` with `ts` as a proper (micro-truncated) TimestampType column.
    *
    * The TIMESTAMP(NANOS) vintage needs one extra step: Spark refuses to even
    * resolve that parquet type unless `spark.sql.legacy.parquet.nanosAsLong`
    * is set, so the schema-adaptive decode would never see a LongType without
    * it. We therefore catch the resolution failure and retry with the conf
    * set (and leave it set — the session is evidently reading a nanos-vintage
    * dataset, and unsetting it after the lazy plan is built would flip the
    * scan's schema under the plan). Every other vintage resolves first try
    * and the conf is never touched.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    decodeEventsTs(
      try p(spark, dir, "events")
      catch {
        case e: Throwable if isNanosRefusal(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          p(spark, dir, "events")
      })

  /** Spark's refusal to resolve parquet TIMESTAMP(NANOS) without the legacy
    * conf, matched on the message (the exception class differs across Spark
    * versions: AnalysisException vs SparkUnsupportedOperationException).
    */
  private def isNanosRefusal(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("NANOS") || (m.contains("Parquet type") && m.contains("TIMESTAMP"))
    }

  /** Normalize an events frame's `ts` to `TimestampType` micros regardless of
    * how the parquet encoded it (see object doc). Used by the batch loader
    * and by the streaming stagers, so every consumer shares one decode.
    */
  private[graft] def decodeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy nanosAsLong read: nanos since epoch (long) -> micros ->
        // TimestampType. Integer DIV, not `/`: Spark's `/` on longs is double
        // division, and 2024-epoch nanos (~1.7e18) exceed double's 53-bit
        // mantissa — truncating the quotient can land up to ~256 ns off, i.e.
        // occasionally in the WRONG microsecond.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] isAdjustedToUTC=false: naive micros. Under a UTC
        // session the cast is a pure reinterpretation (no wall-clock shift),
        // matching DuckDB's naive read of the same file.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        raw // already micros LTZ
      case other =>
        throw new IllegalStateException(
          s"events.ts resolved as unsupported type $other — extend Tables.decodeEventsTs")
    }
}
