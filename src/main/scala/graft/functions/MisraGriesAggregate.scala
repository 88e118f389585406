package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Misra-Gries heavy-hitter buffer: at most `k` (word, count) counters.
  * When an insert would exceed `k` counters, ALL counters are decremented by
  * the evicted minimum (the batch form of the classic decrement step), so
  * every stored count undercounts its true frequency by at most
  * (n − Σstored)/(k+1) ≤ n/(k+1). Buffers MERGE by counter addition followed
  * by the same shrink — the mergeable-summaries result (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) keeps the combined error ≤ n/(k+1) for
  * the combined n, which is what makes the sketch a partial-aggregable
  * heavy-hitter summary at 100 TB: each partition ships k counters, never a
  * word histogram.
  */
final class MGBuffer(val k: Int) {
  val m: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(w: String, c: Long): Unit = {
    m.updateWith(w) { case prev => Some(prev.getOrElse(0L) + c) }
    if (m.size > k) shrink()
  }

  /** Reduce to ≤ k counters: subtract the (k+1)-th largest count from all,
    * dropping the non-positive — one batched MG decrement round.
    */
  def shrink(): Unit = {
    if (m.size <= k) return
    val vs = m.values.toArray
    java.util.Arrays.sort(vs)
    val pivot = vs(vs.length - k - 1) // (k+1)-th largest
    m.filterInPlace((_, v) => v > pivot)
    m.mapValuesInPlace((_, v) => v - pivot)
    m.filterInPlace((_, v) => v > 0)
  }
}

/** `graft_mg(word, k)` — grouped Misra-Gries heavy-hitter sketch returning
  * `map<string, bigint>` of ≤ k surviving counters. Counter VALUES are
  * merge-order dependent (inherent to MG), so consumers must only rely on
  * the theorem-backed envelope `true − ⌊n/(k+1)⌋ ≤ counter ≤ true`
  * (absent counter = 0) — which is exactly the boolean the q147 query emits
  * for its oracle.
  */
case class MisraGries(
    wordExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(wordExpr, kExpr)
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val w = wordExpr.eval(input)
    if (w != null) buf.add(w.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    other.m.foreach { case (w, c) => buf.add(w, c) }
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = buf.m.toArray
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.m.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(wordExpr = c(0), kExpr = c(1))
}
