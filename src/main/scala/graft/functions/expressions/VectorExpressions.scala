package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Codegen'd ADC (asymmetric distance computation) score for PQ serving:
  * `Σ_j lut[j][codes[j]]` over `codes array<int>` (one code per subspace)
  * and a query-side lookup table `lut array<array<double>>`.
  *
  * This is the per-candidate hot loop of IVF-PQ ([[graft.operators.Pq]]):
  * at 100 TB every probed index row pays exactly this — m array reads and
  * m adds — so it must live inside WholeStageCodegen, not in interpreted
  * higher-order functions (the HOF rendering cost ~30× the fused loop).
  * Null when lengths mismatch or a code falls outside its table.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adc_score needs (array<int>, array<array<double>>), got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != lut.numElements()) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      val table = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= table.numElements()) return null
      s += table.getDouble(c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val tab = ctx.freshName("tab")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $codes.numElements();
         |if ($m != $lut.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $tab = $lut.getArray($j);
         |    final int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $tab.numElements()) { ${ev.isNull} = true; break; }
         |    $s += $tab.getDouble($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}

/** Codegen'd PQ ADC lookup-table builder: for a (normalized, double)
  * query vector, `lut[j][c] = Σ_t v[j·dsub+t] · books[j][c][t]` against
  * codebooks CAPTURED IN THE EXPRESSION (shipped once per task as a
  * reference object, not re-read per row).
  *
  * The higher-order-function rendering of this table costs m·ksub
  * interpreted lambda dispatches per query row — at a 1000-query batch
  * that's ~10⁸ interpreted evals and it dominated the PQ serve; this
  * fused loop brings the probe side into codegen alongside [[AdcScore]].
  */
case class PqLut(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_lut needs array<double>, got $dt")
    }

  @transient private lazy val dsub = books(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = books.length
    // A query of the wrong dimensionality must surface as null (matching
    // AdcScore's mismatch behavior), not as out-of-bounds reads — on
    // UnsafeArrayData those read silent garbage, not an exception.
    if (v.numElements() != m * dsub) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val lut = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val center = book(c)
        var s = 0.0
        var t = 0
        while (t < dsub) { s += v.getDouble(j * dsub + t) * center(t); t += 1 }
        lut(c) = s
        c += 1
      }
      out(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val ds = ctx.freshName("ds")
      val out = ctx.freshName("out")
      val lut = ctx.freshName("lut")
      val book = ctx.freshName("book")
      s"""
         |final int $m = $booksRef.length;
         |final int $ds = $booksRef[0][0].length;
         |if ($v.numElements() != $m * $ds) {
         |  ${ev.isNull} = true;
         |} else {
         |  final Object[] $out = new Object[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    final double[][] $book = $booksRef[$j];
         |    final double[] $lut = new double[$book.length];
         |    for (int $c = 0; $c < $book.length; $c++) {
         |      double $s = 0.0;
         |      for (int $t = 0; $t < $ds; $t++) {
         |        $s += $v.getDouble($j * $ds + $t) * $book[$c][$t];
         |      }
         |      $lut[$c] = $s;
         |    }
         |    $out[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper: codegen'd cosine similarity in [-1, 1]. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: codegen'd PQ ADC score Σ_j lut[j][codes[j]]. */
  def adcScore(codes: Column, lut: Column): Column =
    ColumnBridge.column(AdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

  /** Column wrapper: codegen'd PQ LUT builder (codebooks captured). */
  def pqLut(nq: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(nq), books))
}
