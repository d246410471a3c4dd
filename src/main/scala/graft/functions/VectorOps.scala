package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused vector dot product as a native expression. The
  * `aggregate(zip_with(...))` higher-order formulation evaluates a
  * lambda per ELEMENT through the interpreted expression walker — for a
  * d-dim pair that is d lambda frames and 2d boxed casts per pair row.
  * This expression runs one tight primitive loop over the two ArrayData
  * buffers instead.
  *
  * Summation is the SAME strictly sequential left-fold over
  * `double(a_i) * double(b_i)` that the HOF form (and DuckDB's
  * list_inner_product) performs, so scores are bit-identical and every
  * existing oracle keeps hashing equal. Element types may be FLOAT or
  * DOUBLE independently per side (the IVF centroids are double arrays,
  * the embeddings float arrays); the accessor is chosen lazily after
  * analysis.
  *
  * NULL semantics match the HOF form EXACTLY in BOTH paths (r03
  * "what's wrong" #3, then ADVICE r04 on the non-nullable path): an
  * element-count mismatch — which zip_with would null-pad, nulling
  * aggregate's running sum — returns NULL regardless of element
  * nullability, and a null element (possible only when a side's
  * `containsNull` is true) nulls the result too. The element-null
  * branch is chosen at PLAN time from the analyzed array types, so the
  * dense-embedding hot path (containsNull = false, which is what the
  * parquet corpus carries) keeps the unchecked tight loop after the
  * one length compare; only genuinely sparse inputs pay the
  * per-element null check.
  */
case class SeqDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"fdot expects ARRAY<FLOAT|DOUBLE>, got $t")
  }
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)
  @transient private lazy val elementsNullable: Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
      case _ => true
    }
  // always nullable: even non-nullable-element inputs can produce NULL
  // on an element-count mismatch (HOF parity)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (elementsNullable) {
      // HOF parity: zip_with null-pads the shorter side, and a null
      // product element nulls aggregate's running sum
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += (if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)) *
          (if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i))
        i += 1
      }
      return acc
    }
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    if (leftFloat && rightFloat) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else if (!leftFloat && !rightFloat) {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    } else {
      def get(d: ArrayData, f: Boolean, j: Int): Double =
        if (f) d.getFloat(j).toDouble else d.getDouble(j)
      while (i < n) {
        acc += get(x, leftFloat, i) * get(y, rightFloat, i); i += 1
      }
    }
    acc
  }
  /** Whole-stage-codegen body (r03's CodegenFallback closed): the same
    * strictly sequential primitive loop as the interpreted path, emitted
    * inline so the surrounding projection keeps one codegen span —
    * element accessors are resolved at CODEGEN time from the analyzed
    * child types, so the per-element branch disappears entirely.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, f: Boolean) =
        if (f) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      if (elementsNullable)
        // nullable-element variant (nullable == true here, so ev.isNull
        // is an assignable local); mirrors the interpreted path exactly
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += ${get(a, leftFloat)} * ${get(b, rightFloat)};
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $acc; }
           |}
         """.stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += ${get(a, leftFloat)} * ${get(b, rightFloat)};
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "fdot"
}

object VectorOps {
  /** Sequential-fold dot product (see [[SeqDotExpr]]). */
  def fdot(a: Column, b: Column): Column =
    ColumnBridge.column(
      SeqDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
