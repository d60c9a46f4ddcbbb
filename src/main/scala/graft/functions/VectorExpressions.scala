package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * The `zip_with` + `aggregate` fold form of a dot product is
  * `CodegenFallback`: interpreted, allocating an intermediate array per row
  * per pair — the dominant cost of round 1's similarity path. This native
  * Catalyst expression participates in whole-stage codegen: one fused
  * primitive loop, no allocation, no virtual calls per element.
  *
  * Semantics match the fold `aggregate(zip_with(a, b, (x, y) =>
  * x.cast(double) * y.cast(double)), 0.0, _+_)` exactly:
  *  - null input array, length mismatch (zip_with pads with null) or any
  *    null element → null;
  *  - accumulation is left-to-right IEEE double addition, so results are
  *    bit-identical to the fold (and to the DuckDB oracle's list_sum of an
  *    ordered list_transform).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric arrays, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def toDouble(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType  => arr.getFloat(i).toDouble
    case LongType   => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType  => arr.getShort(i).toDouble
    case ByteType   => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += toDouble(x, i, lt) * toDouble(y, i, rt)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val hasNull = ctx.freshName("hasNull")
      // Decimal elements surface as o.a.s.sql.types.Decimal objects — a
      // bare (double) cast is invalid Java and would fail codegen compile
      // (silently falling back to interpreted eval); call .toDouble() there.
      def asDouble(code: String, t: DataType): String = t match {
        case _: DecimalType => s"($code).toDouble()"
        case _ => s"((double)($code))"
      }
      val leftGet = asDouble(CodeGenerator.getValue(a, elemType(left), i), elemType(left))
      val rightGet = asDouble(CodeGenerator.getValue(b, elemType(right), i), elemType(right))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |    $acc += $leftGet * $rightGet;
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper: codegen'd dot product of two numeric arrays. */
  def dotProduct(a: Column, b: Column): Column =
    CatalystBridge.column(DotProduct(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
