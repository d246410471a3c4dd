package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp ROLLING hash over character k-grams (builder brief:
  * document fingerprinting): every length-k window's polynomial hash
  * h(i) = Σ_{j<k} c_{i+j} · B^{k-1-j}, base B = 31, computed in ONE
  * O(n) pass with the rolling update h ← (h − c_out·B^{k-1})·B + c_in —
  * not O(n·k) re-hashing per window. No modulus: for k = 8 the largest
  * value is maxChar · (B^8 − 1)/(B − 1) < 2^51, exact in a Long, which
  * makes the hash reproducible with plain integer arithmetic in ANY
  * engine (the DuckDB oracle writes the eight B-power terms literally).
  * Characters are UTF-16 code units (== code points for the ASCII
  * corpus the oracle runs on).
  *
  * Scale shape: scan-local per row, zero shuffles; downstream
  * fingerprint selection (mod-p sampling) and aggregation are ordinary
  * column ops over the returned array.
  */
case class RollingHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 8, "k must be in [1,8] for exact Long arithmetic")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String], k)
  /** Codegen (r03's CodegenFallback closed): one static call into the
    * same tight loop as the interpreted path — the win is staying inside
    * the surrounding whole-stage span (no InterpretedUnsafeProjection
    * fallback for the whole projection), not the loop itself.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpr$$.MODULE$$.compute($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"rolling_hash_$k"
}

object RollingHashExpr {
  /** The O(n) rolling pass, shared by interpreted eval and codegen. */
  def compute(input: UTF8String, k: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val B = 31L
      var topPow = 1L // B^(k-1)
      var j = 1
      while (j < k) { topPow *= B; j += 1 }
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      out(0) = h
      while (i < n) {
        h = (h - s.charAt(i - k) * topPow) * B + s.charAt(i)
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object RollingHash {
  /** Column API: array of all k-gram rolling hashes of `text`. */
  def rolling_hashes(text: Column, k: Int): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(text), k))
}
