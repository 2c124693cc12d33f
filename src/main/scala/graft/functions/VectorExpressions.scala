package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `ArrayType(FloatType|DoubleType)` columns.
  *
  * These reproduce the scalar-function surface the reference delegates to
  * Oracle 23ai (`COSINE_DISTANCE`, `TO_VECTOR`, implicit `L2` norms —
  * reference: `streamlit_app.py:64-67`, `ingest_hotels.py:23,29`) as
  * whole-stage-codegen'd expressions, so a brute-force KNN scan stays in a
  * single `WholeStageCodegen` span with the parquet scan — no UDF
  * serialization boundary. All accumulation is in Double regardless of the
  * stored element type (float parity with the DuckDB oracle, and the
  * reference rounds scores to 2 decimals anyway — `streamlit_app.py:221`).
  *
  * Null semantics: NULL input array → NULL; mismatched dimensions → NULL
  * (the engine validates dims at ingest, see [[VectorFunctions.assertDim]]);
  * null *elements* are treated as 0.0 (fixture vectors are dense,
  * `containsNull` only from parquet schema inference).
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getLeft(a: ArrayData, i: Int): Double =
    if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
  protected def getRight(b: ArrayData, i: Int): Double =
    if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)

  protected def genGetLeft(a: String, i: String): String =
    if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
  protected def genGetRight(b: String, i: String): String =
    if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
}

/** dot(a, b) accumulated in Double, sequential element order (bit-parity
  * with DuckDB's `list_dot_product` on the same values).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0; var i = 0
      while (i < n) { acc += getLeft(a, i) * getRight(b, i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${genGetLeft(a, i)} * ${genGetRight(b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_distance(a, b) = 1 − dot(a,b) / (‖a‖₂ · ‖b‖₂).
  *
  * Full formula (not the unit-vector shortcut) so it is correct for
  * arbitrary vectors; on the reference's L2-normalized embeddings it
  * degenerates to 1 − dot, matching Oracle `COSINE_DISTANCE`
  * (`streamlit_app.py:64-67`). NULL if either norm is 0.
  */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = getLeft(a, i); val y = getRight(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else 1.0 - dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${genGetLeft(a, i)};
         |    final double $y = ${genGetRight(b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = 1.0 - $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_distance(a, b) = ‖a − b‖₂. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0; var i = 0
      while (i < n) { val d = getLeft(a, i) - getRight(b, i); acc += d * d; i += 1 }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = ${genGetLeft(a, i)} - ${genGetRight(b, i)};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

trait VectorUnaryExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.catalogString}")
  }

  protected def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(a: ArrayData, i: Int): Double =
    if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def genGet(a: String, i: String): String =
    if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
}

/** l2_norm(a) = ‖a‖₂ (Double). */
case class L2Norm(child: Expression) extends VectorUnaryExpression {
  override def prettyName: String = "l2_norm"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = get(a, i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${genGet(a, i)};
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_normalize(a): a / ‖a‖₂, preserving the input element type
  * (reference contract: stored embeddings are unit-norm float32,
  * `ingest_hotels.py:23` `normalize_embeddings=True`). NULL for the zero
  * vector.
  */
case class L2Normalize(child: Expression) extends VectorUnaryExpression {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType =
    ArrayType(if (childIsFloat) FloatType else DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = get(a, i); acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    if (norm == 0.0) null
    else if (childIsFloat) {
      val out = new Array[Float](n)
      i = 0; while (i < n) { out(i) = (get(a, i) / norm).toFloat; i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](n)
      i = 0; while (i < n) { out(i) = get(a, i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val norm = ctx.freshName("norm")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      val (jt, castTo) = if (childIsFloat) ("float", "(float) ") else ("double", "")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${genGet(a, i)};
         |  $acc += $x * $x;
         |}
         |final double $norm = java.lang.Math.sqrt($acc);
         |if ($norm == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final $jt[] $out = new $jt[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $castTo(${genGet(a, i)} / $norm);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
