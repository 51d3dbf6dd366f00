package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
// ColumnBridge: Java shim over spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two numeric arrays.
  *
  * Replaces the `zip_with`/`aggregate` higher-order-function composition in
  * [[graft.functions.VectorFunctions.cosine]]: Spark's higher-order
  * functions are interpreted (per-element lambda dispatch + boxing + an
  * intermediate array per pair), which made the brute-force similarity
  * join ~50× slower than necessary. This expression emits a single fused
  * loop inside WholeStageCodegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF version (and to the DuckDB
  * oracle SQL): all math in double, dot/norm accumulated in element order,
  * `denom = sqrt(aa)*sqrt(bb)`, result 0 when denom == 0, null when the
  * arrays differ in length (the HOF version nulls via zip_with padding).
  *
  * Mirrors the cosine space of the reference's ChromaDB collection
  * (`/root/reference/Hybrid_Recom_vecdb.py:157,172-187`).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val aIsF = elemType(left) == FloatType
    val bIsF = elemType(right) == FloatType
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double x = (double) $a.$aGet($i);
         |    final double y = (double) $b.$bGet($i);
         |    $dot += x * y; $aa += x * x; $bb += y * y;
         |  }
         |  final double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column wrapper: codegen'd cosine similarity in [-1, 1]. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
