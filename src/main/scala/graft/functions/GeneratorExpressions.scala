package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram generator (UDTF): one output row per window of `n` adjacent
  * tokens, joined with single spaces — the shingling primitive for n-gram
  * Jaccard / MinHash over *sequences* (where `explode` of the distinct word
  * set loses order information).
  *
  * This exercises the remaining Catalyst extension surface: a custom
  * `Generator`, planned through `ExtractGenerator` → `GenerateExec` like the
  * built-in `explode`. A generator is the right shape here (1 row in →
  * 0..m rows out); `CodegenFallback` is standard for table-generating
  * functions — `GenerateExec` drives `eval` row-by-row, and the surrounding
  * projections stay codegen'd.
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "NGrams: n must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"NGrams requires array<string>, got $t")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Nil
    else {
      val m = arr.numElements()
      (0 to m - n).map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
