package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Heap-based top-k aggregate: `graft_topk(score, payload, k)` keeps the `k`
  * payloads with the highest scores per group (ties broken by smaller
  * payload) and returns them rank-ordered as `array<bigint>`.
  *
  * This is the `TypedImperativeAggregate` pattern SURVEY.md §4 lists as the
  * optional top-k accumulator: a bounded mutable buffer (size-k heap) with
  * partial aggregation — each partition keeps only k candidates and merges
  * spill-free, instead of a full sort + row_number + filter (which shuffles
  * every row and sorts every group). At 100 TB the difference is a full
  * shuffle of the fact table vs k rows per partition per group.
  *
  * Equivalent SQL (and the oracle twin):
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, payload) <= k`.
  */
case class TopKByScore(
    scoreExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  /** (score desc, payload asc) — worst element is the minimum under this. */
  private def worseThan(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  private def insert(buf: mutable.ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf += e
    else {
      var worst = 0
      var i = 1
      while (i < buf.size) { if (worseThan(buf(i), buf(worst))) worst = i; i += 1 }
      if (worseThan(buf(worst), e)) buf(worst) = e
    }
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)], input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null)
      insert(buf, (s.asInstanceOf[Number].doubleValue(), p.asInstanceOf[Number].longValue()))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)], other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortWith((a, b) => worseThan(b, a)).map(_._2).toArray)

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), payloadExpr = c(1), kExpr = c(2))
}
