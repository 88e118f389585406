package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 synthetic range table — the engine's custom-source surface.
  *
  * The reference's only "source" is an object-store listing + CSV download
  * (dag/vacancy_pipline_gpt_rerty.py:44-109); file formats are covered by the
  * parquet/CSV/JSON/ORC round trips. This source exercises the other half of
  * a source API: *pushdown negotiation*. It is a deterministic integer-range
  * table `(id, val, bucket)` (val/bucket are pure functions of id, so an SQL
  * oracle can regenerate it exactly) that implements
  *
  *  - `SupportsPushDownFilters`: range predicates on `id` narrow the
  *    generated range AT PLANNING TIME — the source-level analog of
  *    partition pruning (rows outside the range are never produced, the
  *    filter disappears from the post-scan plan);
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    computed and materialized into each `InternalRow`;
  *  - `SupportsPushDownLimit`: a pushed limit caps generation.
  *
  * At 100 TB the same negotiation is what makes a real connector viable:
  * scan ranges come from the predicate, projection width from the plan, and
  * the executor-side readers ([[GraftRangePartition]] splits) generate/fetch
  * only what survives both.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false)))
  def valOf(id: Long): Long = (id * 2654435761L) % 1000L
  def bucketOf(id: Long): Long = id % 10L
}

class GraftRangeTable(start: Long, end: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, slices)
}

class GraftRangeScanBuilder(start0: Long, end0: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var lo = start0
  private var hi = end0
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeSource.schema
  private var limit: Option[Int] = None
  // (schema of the aggregated output, precomputed result rows)
  private var aggResult: Option[(StructType, Array[Array[Any]])] = None

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
      case _ => None
    }

  /** COMPLETE aggregate pushdown: for `COUNT(*) / MIN(id) / MAX(id)`,
    * optionally grouped by `bucket`, the deterministic range needs no scan
    * at all — results are closed-form over [lo, hi) and are computed here,
    * at planning time. This is the deepest pushdown tier (the same contract
    * JDBC sources use to turn `SELECT count(*)` into a remote aggregate):
    * the source's Batch then serves the final rows and Spark plans no
    * aggregation above the scan.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    tryComputeAgg(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    val r = tryComputeAgg(agg)
    r.foreach(v => aggResult = Some(v))
    r.isDefined
  }

  private def tryComputeAgg(agg: Aggregation): Option[(StructType, Array[Array[Any]])] = {
    val groupCols = agg.groupByExpressions().toSeq.map(fieldOf)
    val okGroup = groupCols.forall(_.contains("bucket")) && groupCols.size <= 1
    val fns = agg.aggregateExpressions().toSeq
    val okFns = fns.forall {
      case _: CountStar => true
      case m: Min => fieldOf(m.column).contains("id")
      case m: Max => fieldOf(m.column).contains("id")
      case _ => false
    }
    if (!okGroup || !okFns || fns.isEmpty) return None

    // per-group (first, last, count) over the arithmetic progression of ids
    // in [lo, hi) — no rows generated, pure closed form
    val groups: Seq[(Option[Long], Long, Long, Long)] =
      if (groupCols.isEmpty) {
        if (hi <= lo) Seq.empty else Seq((None, lo, hi - 1, hi - lo))
      } else {
        (0L until 10L).flatMap { b =>
          val first = lo + (((b - lo) % 10) + 10) % 10
          if (first >= hi) None
          else {
            val last = first + 10L * ((hi - 1 - first) / 10L)
            Some((Some(b), first, last, (last - first) / 10L + 1))
          }
        }
      }
    val aggFields = fns.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"count_$i", LongType, nullable = false)
      case (_: Min, i)       => StructField(s"min_$i", LongType, nullable = false)
      case (_: Max, i)       => StructField(s"max_$i", LongType, nullable = false)
      case (f, _)            => throw new IllegalStateException(s"unreachable: $f")
    }
    val schema = StructType(
      groupCols.flatten.map(n => StructField(n, LongType, nullable = false)) ++ aggFields)
    val rows = groups.map { case (bucket, first, last, n) =>
      (bucket.toSeq ++ fns.map {
        case _: CountStar => n
        case _: Min       => first
        case _: Max       => last
      }).toArray[Any]
    }.toArray
    Some((schema, rows))
  }

  private def long(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Accept id range/equality predicates by narrowing [lo, hi); everything
    * else is returned as a residual for Spark to evaluate post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThan("id", v)        => long(v).exists { x => lo = math.max(lo, x + 1); true }
      case GreaterThanOrEqual("id", v) => long(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("id", v)           => long(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("id", v)    => long(v).exists { x => hi = math.min(hi, x + 1); true }
      case EqualTo("id", v)            => long(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x + 1); true }
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def build(): Scan = aggResult match {
    case Some((schema, rows)) => new GraftPrecomputedScan(schema, rows, lo, hi)
    case None                 => new GraftRangeScan(lo, hi, slices, required, limit)
  }
}

/** Scan serving a planning-time-computed aggregate result (see
  * [[GraftRangeScanBuilder.pushAggregation]]).
  */
class GraftPrecomputedScan(schema: StructType, rows: Array[Array[Any]],
                           lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRange[lo=$lo,hi=$hi,agg=${schema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRowsPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rs = p.asInstanceOf[GraftRowsPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = new GenericInternalRow(rs(i))
          override def close(): Unit = ()
        }
      }
    }
}

case class GraftRowsPartition(rows: Array[Array[Any]]) extends InputPartition

class GraftRangeScan(lo: Long, hi: Long, slices: Int, required: StructType,
                     limit: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRange[lo=$lo,hi=$hi,cols=${required.fieldNames.mkString(",")}" +
      limit.map(l => s",limit=$l").getOrElse("") + "]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    limit match {
      // limit without ordering = "any N rows": one split of the first N
      case Some(l) => Array(GraftRangePartition(lo, lo + math.min(n, l.toLong)))
      case None =>
        val per = math.max(1L, (n + slices - 1) / slices)
        (0 until slices).iterator
          .map(i => GraftRangePartition(lo + i * per, math.min(hi, lo + (i + 1) * per)))
          .filter(p => p.from < p.until)
          .toArray[InputPartition]
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required.fieldNames)
}

case class GraftRangePartition(from: Long, until: Long) extends InputPartition

/** Reader factory with BOTH row and columnar paths. The columnar path fills
  * `ColumnarBatch`es of long vectors directly (4096 rows at a time), so
  * Spark plans the scan as a columnar source followed by a single
  * `ColumnarToRow` transition at the whole-stage-codegen boundary — the
  * same hand-off the vectorized parquet reader uses, and the reason a scan
  * can feed Tungsten without per-row object allocation.
  */
class GraftRangeReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  private val BatchRows = 4096

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = gp.from - 1
      override def next(): Boolean = { cur += 1; cur < gp.until }
      override def get(): InternalRow = {
        val values: Array[Any] = cols.map {
          case "id"     => cur
          case "val"    => GraftRangeSource.valOf(cur)
          case "bucket" => GraftRangeSource.bucketOf(cur)
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    p.isInstanceOf[GraftRangePartition]

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val gp = p.asInstanceOf[GraftRangePartition]
    val schema = StructType(cols.map(c => StructField(c, LongType, nullable = false)))
    new PartitionReader[ColumnarBatch] {
      private var cur = gp.from
      private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, schema)
      private val batch = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])

      override def next(): Boolean = {
        if (cur >= gp.until) return false
        val n = math.min(BatchRows.toLong, gp.until - cur).toInt
        var c = 0
        while (c < cols.length) {
          val v = vectors(c); v.reset()
          val fill: Long => Long = cols(c) match {
            case "id"     => identity
            case "val"    => GraftRangeSource.valOf
            case "bucket" => GraftRangeSource.bucketOf
          }
          var i = 0
          while (i < n) { v.putLong(i, fill(cur + i)); i += 1 }
          c += 1
        }
        batch.setNumRows(n)
        cur += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

/** Query builders over the custom source (driver-contract entries). */
object GraftRangeQueries {
  /** Per-bucket aggregate over a pushed id range: the filter never reaches
    * the post-scan plan — the scan's [lo, hi) absorbs it (spec-asserted via
    * the scan description).
    */
  def bucketAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.GraftRangeSource")
      .option("start", "0").option("end", "100000").option("slices", "32")
      .load()
      .filter(col("id") >= 20000L && col("id") < 60000L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("bucket"))

  val bucketAggOracle: String =
    """SELECT id % 10 AS bucket, count(*) AS n,
      | CAST(sum((id * 2654435761) % 1000) AS BIGINT) AS sum_val,
      | min(id) AS min_id, max(id) AS max_id
      |FROM (SELECT range AS id FROM range(20000, 60000))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** COUNT/MIN/MAX per bucket over a pushed id range — the WHOLE query
    * (filter AND aggregation) resolves at planning time inside the source;
    * the "scan" serves 10 final rows (spec-asserted: no aggregate above the
    * scan in the physical plan).
    */
  def pushedAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.GraftRangeSource")
      .option("start", "0").option("end", "1000000").option("slices", "32")
      .load()
      .filter(col("id") >= 123L && col("id") < 987654L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("bucket"))

  val pushedAggOracle: String =
    """SELECT id % 10 AS bucket, count(*) AS n, min(id) AS min_id, max(id) AS max_id
      |FROM (SELECT range AS id FROM range(123, 987654))
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
