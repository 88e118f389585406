package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass sketch kernels for the dedup family.
  *
  * The round-1 formulations built SimHash from 16 separate higher-order
  * `aggregate()` folds (16 interpreted passes over the word-hash array,
  * re-planned on both sides of every band self-join) and MinHash from k
  * nested `transform()` lambdas. Both sketches are trivially one-pass:
  * a single static-call loop computes every bit/permutation while the row
  * stays inside whole-stage codegen. Same preference order as
  * [[VectorKernels]]: compose built-ins < custom `Expression` < custom
  * physical operator.
  */
object SketchKernels {
  /** 64-bit finalizer (murmur3 fmix64 constants — public domain) spreading
    * the small polynomial word hashes (< 2^20) over all 64 bits so every
    * SimHash bit position carries signal.
    */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33); z
  }

  /** One-pass 64-bit SimHash (Charikar) over an array<long> of word hashes:
    * bit i of the fingerprint is the sign of Σ_w (±1 by bit i of mix64(h_w)).
    */
  def simHash64(hs: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hs.numElements()
    var w = 0
    while (w < n) {
      val x = mix64(hs.getLong(w))
      var i = 0
      while (i < 64) {
        counts(i) += (((x >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** k MinHash values in one pass: perm_i(h) = ((2i+3)·h + 7i+1) mod P —
    * the same permutation family as `DedupOps.perm` (and its SQL twin), so
    * k=8 prefixes agree with the oracle-checked signature query.
    */
  def minhashSigs(hs: ArrayData, k: Int): ArrayData = {
    val P = 1000003L
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var w = 0
    while (w < n) {
      val h = hs.getLong(w)
      var i = 0
      while (i < k) {
        val v = ((2L * i + 3) * h + (7L * i + 1)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash fingerprint of an ArrayType(LongType) word-hash column. */
object AvgHashKernel {
  /** One-pass 64-bit average-hash of a payload string — the q187 kernel.
    * Semantics are EXACTLY the SQL formulation the oracle checks
    * (`ascii(substring(text, (i·nb) DIV 64 + 1, 1))`, Spark `ascii` =
    * codePointAt(0) of the 1-char substring, 0 past the end; mean test
    * `64·bᵢ > Σb`), compiled: the HOF version pays 64 interpreted lambda
    * frames per row and re-derives the sample list inside the pushed-down
    * join-key null filter — this stays inside whole-stage codegen.
    */
  def avgHash64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val nb = s.numBytes.toLong
    val bs = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val p = ((i * nb) / 64).toInt + 1
      val sub = s.substringSQL(p, 1)
      val b = if (sub.numChars > 0) sub.toString.codePointAt(0).toLong else 0L
      bs(i) = b; total += b
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 64) { if (bs(i) * 64 > total) h |= (1L << i); i += 1 }
    h
  }
}

/** 64-bit average-hash of a StringType payload column (the q187 kernel). */
case class AvgHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    AvgHashKernel.avgHash64(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.AvgHashKernel.avgHash64($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash fingerprint (see above). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any): Any =
    SketchKernels.simHash64(h.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchKernels.simHash64($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Array of k MinHash signature values of an ArrayType(LongType) column. */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "MinhashSigs: k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any): Any =
    SketchKernels.minhashSigs(h.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchKernels.minhashSigs($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
