package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Bucket index of a double value among sorted distinct cutpoints: the count
  * of cutpoints strictly below the value (ties land in the lower bucket,
  * matching the `value > cut` indicator-sum it replaces).
  *
  * Why an Expression and not composed ops: the previous chained-when
  * indicator sum was O(P) in BOTH plan size and per-row work — at thousands
  * of partitions the expression tree alone breaks whole-stage codegen. This
  * is O(1) plan size (one boxed double[] reference) and O(log P) per row
  * (`java.util.Arrays.binarySearch`), and stays inside whole-stage codegen.
  */
case class SearchBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression {
  require(cuts.nonEmpty, "SearchBucket needs at least one cutpoint")

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SearchBucket requires a DOUBLE child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val b = java.util.Arrays.binarySearch(cuts, input.asInstanceOf[Double])
    if (b >= 0) b else -(b + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("cuts", cuts, "double[]")
    // freshName: two SearchBuckets in one codegen scope must not both
    // declare the same Java local (duplicate-variable CompileException)
    val b = ctx.freshName("graftSb")
    nullSafeCodeGen(ctx, ev, c => s"""
      int $b = java.util.Arrays.binarySearch($arr, $c);
      ${ev.value} = $b >= 0 ? $b : -($b + 1);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SearchBucket =
    copy(child = newChild)

  override def prettyName: String = "search_bucket"
}

object SearchBucket {
  /** Column API: bucket of `value` among `cuts` (sorted+deduped here). */
  def bucket(value: Column, cuts: Array[Double]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SearchBucket(
        org.apache.spark.sql.GraftColumnBridge.expression(value.cast("double")),
        cuts.distinct.sorted))
}
