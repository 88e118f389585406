package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** K-minimum-values distinct sketch buffer: the `k` SMALLEST DISTINCT hash
  * values seen so far (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM'02). The k-th smallest of n distinct uniform hashes
  * on [0, 2⁴⁸) sits near k·2⁴⁸∕n, so n ≈ (k−1)·2⁴⁸∕h₍ₖ₎ — an unbiased
  * estimator with rel. error ≈ 1∕√(k−2). Buffers MERGE by set union
  * re-capped at k (mergeable summaries), which is what makes the sketch a
  * partial-aggregable distinct counter at 100 TB: each partition ships ≤ k
  * longs per group, never a value set — contrast `count(DISTINCT x)`'s
  * full expand-shuffle of every distinct value.
  *
  * The sketch is DETERMINISTIC given the hash column (same set in, same k
  * minima out, any partitioning/merge order) — which is why its oracle twin
  * can be EXACT SQL (rank the distinct hashes, keep rn ≤ k), unlike
  * engine-opaque HLL internals (q93 can only band-check approx_distinct).
  */
final class KmvBuffer(val k: Int) {
  val set: mutable.TreeSet[Long] = mutable.TreeSet.empty

  def add(h: Long): Unit = {
    if (set.size < k) set += h // TreeSet dedups
    else if (h < set.last && set.add(h)) set -= set.last
  }
}

/** `graft_kmv(hash, k)` — grouped KMV sketch returning the ≤ k smallest
  * distinct hashes as an ascending `array<bigint>` (fewer than k ⇒ the
  * group's full distinct hash set, and the consumer reads the exact count).
  */
case class KmvSketch(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.set.foreach(buf.add)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.set.toArray)

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.set.size)
    buf.set.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashExpr = c(0), kExpr = c(1))
}
