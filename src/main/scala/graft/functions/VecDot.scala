package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Dot product of two numeric array columns as a native Catalyst
  * expression WITH codegen — the hot scalar of every similarity query.
  *
  * Why not `aggregate(zip_with(...))`: Catalyst higher-order functions are
  * interpreted (no codegen) and allocate a lambda frame per element; this
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen. Semantics are identical to the higher-order formulation used
  * previously (and by the DuckDB oracle's list_dot_product): each element is
  * widened to double BEFORE multiplying, and the sum folds left-to-right
  * in index order, so results are bit-deterministic across engines.
  *
  * Elements must be FLOAT or DOUBLE and non-null (embedding vectors and
  * literal centroid/hyperplane arrays — both guaranteed dense); arrays are
  * assumed equal-length (fixed 64-dim vectors throughout).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left).contains(FloatType)
    val yf = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Loop variable MUST be a fresh name: outside whole-stage codegen
    // (UnsafeProjection/MutableProjection) the generated method's input-row
    // parameter is literally named `i`, and a hardcoded `int i` collides →
    // janino "Redefinition of local variable" → silent interpreter fallback.
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val idx = ctx.freshName("idx")
      def getter(v: String, e: Expression): String =
        if (elemType(e).contains(FloatType)) s"((double) $v.getFloat($idx))"
        else s"$v.getDouble($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $idx = 0; $idx < $n; $idx++) {
         |  $acc += ${getter(a, left)} * ${getter(b, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column API: `vecDot($"a", $"b")`. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
