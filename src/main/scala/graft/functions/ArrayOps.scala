package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer-vector kernels (SURVEY.md §7.3: custom Expression only
  * where built-ins fall short — here, `zip_with`+`aggregate` are
  * HigherOrderFunctions that evaluate one lambda call per element per row
  * and block whole-stage codegen; these expressions compile to a tight
  * primitive loop instead, which matters when similarity search evaluates
  * millions of pairs × 64 dims).
  *
  * Both operate on `array<bigint>` (the engine's fixed-point quantized
  * vectors, see [[graft.operators.Similarity]]).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"expected array<bigint>, got ${left.dataType}/${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = ArrayOps.checkSameLength(x, y)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = graft.functions.ArrayOps.checkSameLength($x, $y);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of squares of an array<bigint> — the quantized squared norm. */
case class LongArrayNorm2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<bigint>, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i)
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => {
      // inline helper call keeps the generated code small
      s"graft.functions.ArrayOps.norm2($x)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayOps {
  /** Column API for the kernels. */
  def longDot(a: Column, b: Column): Column =
    column(LongArrayDot(expression(a), expression(b)))
  def longNorm2(a: Column): Column =
    column(LongArrayNorm2(expression(a)))

  /** Mismatched vector lengths are a data bug (a truncated dot product
    * would silently look like a plausible similarity) — fail loudly.
    */
  def checkSameLength(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"LongArrayDot: vector lengths differ (${n} vs ${y.numElements()})")
    }
    n
  }

  /** Runtime helper for generated code. */
  def norm2(x: ArrayData): Long = {
    var acc = 0L
    var i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i)
      acc += v * v
      i += 1
    }
    acc
  }
}
