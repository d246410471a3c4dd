package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Top-k frequency terms of a text — the deterministic stand-in for the
  * newspaper library's `nlp()` keyword list that the reference prepends
  * to an article's meta keywords
  * (`/root/reference/src/newslookout/news_event.py:379-380`; the library
  * ranks stopword-filtered terms by frequency). The library itself is a
  * non-deterministic external dependency, so the stand-in fixes every
  * choice: tokens = lowercase split on single spaces, drop empties and
  * the language-ID stopword table ([[TopTermsExpr.enStops]] — the same
  * function-word table the q_lang_id scorer counts), rank by (count
  * desc, first-occurrence asc) — a total order, since first positions
  * are unique per distinct term — and keep the first k.
  *
  * One native pass per row (split once, one hash-map count, one bounded
  * sort over distinct terms), scan-local, codegen via static call —
  * the same shape as [[WordNgramsExpr]], for the same reason: HOF
  * compositions re-evaluate bound columns per element under some plan
  * shapes, and this feeds the per-article assembly path.
  */
case class TopTermsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TopTermsExpr.compute(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TopTermsExpr$$.MODULE$$.compute($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"top_${k}_terms"
}

object TopTermsExpr {
  /** The language-ID stopword table (shared with the q_lang_id /
    * q_quality_score scorers — "reuse the language-ID stopword table",
    * VERDICT r04 item 2; extended past the original seven function words
    * per VERDICT r05 item 3). Lowercase, alternation-safe (plain word
    * characters only): both engines count hits with ONE
    * `\b(?:w1|w2|…)\b` scan per row instead of |stops| scans.
    */
  val enStops: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "are", "was",
    "were", "be", "been", "for", "on", "with", "as", "at", "by", "it",
    "that", "this", "from", "or", "not", "but", "have", "has", "had",
    "they", "their", "which", "will", "would", "its", "he", "she", "we",
    "you", "his", "her", "them", "than", "then", "there", "these",
    "those", "over", "under", "into", "about", "after", "before", "out",
    "up", "down", "no", "so", "if", "do", "does", "did", "can", "could",
    "said", "also", "more", "most", "other", "some", "such", "only",
    "new", "one", "two", "all", "any", "each", "per", "between", "while",
    "during", "through", "because", "against", "where", "when", "what",
    "who", "how", "why", "now", "very", "just", "both", "being", "am")
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    enStops.foreach(s.add)
    s
  }

  /** One-pass top-k: counts and first positions accumulate over the
    * stopword-filtered token sequence (positions are 1-based indices
    * WITHIN that filtered sequence, matching the DuckDB mirror's
    * `list_position` over the filtered list).
    */
  def compute(input: UTF8String, k: Int): ArrayData = {
    val toks = input.toLowerCase.toString.split(" ", -1)
    // term -> (count, firstPos); LinkedHashMap so iteration order is
    // first-occurrence order (stable tie handling falls out of the sort)
    val counts = new java.util.LinkedHashMap[String, Array[Int]]()
    var pos = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && !stopSet.contains(t)) {
        pos += 1
        val e = counts.get(t)
        if (e == null) counts.put(t, Array(1, pos))
        else e(0) += 1
      }
      i += 1
    }
    val entries = new Array[(String, Int, Int)](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      entries(j) = (e.getKey, e.getValue()(0), e.getValue()(1))
      j += 1
    }
    // count desc, then first occurrence asc (unique per term → total)
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Int, Int)] {
      override def compare(a: (String, Int, Int), b: (String, Int, Int)): Int = {
        val c = Integer.compare(b._2, a._2)
        if (c != 0) c else Integer.compare(a._3, b._3)
      }
    })
    val n = math.min(k, entries.length)
    val out = new Array[Any](n)
    var m = 0
    while (m < n) { out(m) = UTF8String.fromString(entries(m)._1); m += 1 }
    new GenericArrayData(out)
  }
}

object TopTerms {
  /** Column API: top-k frequency non-stopword terms of `text`. */
  def top_terms(text: Column, k: Int): Column =
    ColumnBridge.column(TopTermsExpr(ColumnBridge.expression(text), k))
}
