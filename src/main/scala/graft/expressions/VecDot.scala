package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over ArrayType(Float|Double) columns.
  *
  * Why an Expression and not VectorFns.dotFold (zip_with + aggregate):
  * the higher-order-function path allocates an intermediate array and
  * evaluates two lambdas per element through LambdaFunction plumbing;
  * this compiles to a tight primitive loop inside whole-stage codegen —
  * the difference is ~10× on the ANN/dedup hot paths, which at 100 TB
  * scale is the difference between a CPU-bound and an IO-bound scan.
  *
  * Semantics are IDENTICAL to dotFold by construction: accumulate
  * left-to-right in double (floats widened exactly), so swapping it in
  * cannot change oracle-checked results (VecDotSpec asserts this).
  *
  * Nulls: null array → null result, and mismatched lengths → null
  * (dotFold's zip_with pads with null and propagates — a corrupt
  * ragged embedding surfaces as NULL, never as a silent partial dot).
  * Array *elements* are assumed non-null (embedding vectors).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged inputs yield null

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getL * $getR;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Column-API entry point. */
  def vecDot(a: Column, b: Column): Column =
    graftbridge.column(
      VecDot(graftbridge.expression(a), graftbridge.expression(b)))

  /** Cosine from precomputed norms (same formula as the SQL twins). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    vecDot(a, b) / (na * nb)
}
