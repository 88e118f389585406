package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Mutable t-digest buffer: a mix of ingested points and compressed
  * centroids as (mean, weight) pairs. `compress()` is the merging-digest
  * pass (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
  * t-Digests"): sort by mean, then greedily merge adjacent clusters while
  * the merged weight stays under the k1-scale size bound
  * 4·n·q(1−q)/δ — small clusters near the tails (q→0,1), large in the
  * middle, which is what gives t-digest its relative tail accuracy.
  */
final class TDigestBuffer(val compression: Double) {
  val cs: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty
  private val compressTrigger = math.max(64, (compression * 8).toInt)

  def add(mean: Double, weight: Long): Unit = {
    cs += ((mean, weight))
    if (cs.size >= compressTrigger) compress()
  }

  def compress(): Unit = {
    if (cs.size <= 1) return
    val sorted = cs.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum.toDouble
    cs.clear()
    var (cm, cw) = sorted.head
    var cumBefore = 0L
    var i = 1
    while (i < sorted.size) {
      val (m, w) = sorted(i)
      val q = (cumBefore + (cw + w) / 2.0) / total
      val limit = 4.0 * total * q * (1.0 - q) / compression
      if (cw + w <= limit) {
        val nw = cw + w
        cm = (cm * cw + m * w) / nw
        cw = nw
      } else {
        cs += ((cm, cw)); cumBefore += cw
        cm = m; cw = w
      }
      i += 1
    }
    cs += ((cm, cw))
  }

  /** Quantile estimate: interpolate between adjacent centroid means with the
    * standard center-of-mass positions; clamps to the extreme means at the
    * tails.
    */
  def quantile(p: Double): Double = {
    compress()
    if (cs.isEmpty) return Double.NaN
    val sorted = cs.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum.toDouble
    val target = p * total
    var cum = 0.0
    var prevCenter = Double.NaN
    var prevMean = sorted.head._1
    var i = 0
    while (i < sorted.size) {
      val (m, w) = sorted(i)
      val center = cum + w / 2.0
      if (target < center) {
        if (i == 0 || prevCenter.isNaN) return m
        val f = (target - prevCenter) / (center - prevCenter)
        return prevMean + f * (m - prevMean)
      }
      prevCenter = center; prevMean = m; cum += w
      i += 1
    }
    sorted.last._1
  }
}

/** `graft_tdigest(value, probs, compression)` — grouped t-digest quantiles:
  * per group, a mergeable t-digest of `value` is built with partial
  * aggregation (each partition keeps one digest of ≤ O(δ) centroids and
  * digests MERGE by centroid concatenation + recompression — the property
  * that makes quantiles incremental at 100 TB the same way q123's
  * sum/min/max and q124's HLL are), then evaluated at the literal `probs`
  * array, returning `array<double>`.
  *
  * Estimates depend on merge order (inherent to t-digest — centroids are
  * not a deterministic function of the multiset), so the query carries no
  * SQL oracle; the spec bounds rank error against exact order statistics
  * and proves merge(partials) ≈ direct within the same bound. The
  * deterministic, hash-matchable member of the mergeable-quantile family is
  * the fixed-bin histogram sketch (q136); this is the tail-accurate,
  * constant-memory member.
  */
case class TDigestQuantiles(
    valueExpr: Expression,
    probsExpr: Expression,
    compressionExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  private lazy val compression: Double =
    compressionExpr.eval(InternalRow.empty).asInstanceOf[Number].doubleValue()
  private lazy val probs: Array[Double] = {
    val a = probsExpr.eval(InternalRow.empty).asInstanceOf[ArrayData]
    a.toDoubleArray()
  }

  override def children: Seq[Expression] = Seq(valueExpr, probsExpr, compressionExpr)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(compression)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].doubleValue(), 1L)
    buf
  }

  override def merge(buf: TDigestBuffer, other: TDigestBuffer): TDigestBuffer = {
    other.cs.foreach { case (m, w) => buf.add(m, w) }
    buf
  }

  override def eval(buf: TDigestBuffer): Any =
    new GenericArrayData(probs.map(buf.quantile))

  override def serialize(buf: TDigestBuffer): Array[Byte] = {
    buf.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(buf.compression)
    out.writeInt(buf.cs.size)
    buf.cs.foreach { case (m, w) => out.writeDouble(m); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TDigestBuffer(in.readDouble())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.cs += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), probsExpr = c(1), compressionExpr = c(2))
}
