package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as ONE native pass: split `text` on single
  * spaces (all splits kept, including empty tokens from consecutive /
  * trailing separators — exactly `split(text, " ")` / DuckDB
  * `string_split`) and emit every n consecutive words re-joined with a
  * space.
  *
  * Exists for constant-factor sanity, not expressiveness: the
  * equivalent builtin composition
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', element_at…))`
  * measured ~19 µs per output shingle at the sf0.1 bench — Catalyst
  * inlines the bound `split()` column into every element-level
  * reference under this plan shape (explode over a union), so the
  * 300-char split re-runs per ELEMENT. One expression, one pass: the
  * split happens once per row and gram assembly is substring copies.
  * Every dedup operator (MinHash, Jaccard/PPJoin, survivors) evaluates
  * this subtree, often twice per plan, so its constant IS the suite's
  * dedup constant.
  *
  * Deterministic, null-safe, codegen via a static call (stays inside
  * the surrounding whole-stage span).
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramsExpr$$.MODULE$$.compute($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"word_${n}grams"
}

object WordNgramsExpr {
  /** Split-once n-gram assembly, shared by interpreted eval and codegen.
    * Split semantics match `functions.split(text, " ")` (Java split with
    * limit -1: empty tokens between consecutive separators and at the
    * ends are kept).
    */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    val words = s.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](words.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object WordGrams {
  /** Column API: array of word n-gram shingles of `text`. */
  def word_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(text), n))
}
