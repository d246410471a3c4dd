package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KeywordFlags

/** The data-processor plugin chain (SURVEY.md §3.3; worker.py:487-528):
  * each enabled processor runs over every article in ascending
  * executionPriority (W1, queue_manager.py:410-440). The reference
  * rewrites the article JSON file once per plugin; here the chain
  * collapses into successive column expressions in ONE pass over the
  * articles table — same result, one write.
  *
  * Processors rebuilt:
  *  1. dataprep (plugins/mod_dataprep.py:97-108) — text strip (the
  *     reference's cleanText body is just strip()).
  *  2. keyword flags (plugins/mod_keywordflags.py:108-133) — the 19
  *     trigger-word indicator map.
  *  3. eventclass (plugins/mod_eventclass.py:147-187) — per-sentence
  *     classification summed per article; deterministic stand-in scores
  *     (the reference ships finBERT disabled by default and emits fixed
  *     defaults, mod_eventclass.py:157).
  */
object PostProcess {

  private def sentences(text: Column): Column =
    filter(split(text, "\\. "), s => length(s) > 0)

  private def sentenceScore(s: Column): Column =
    (length(s) % 10).cast("double") / 10.0

  /** classification struct {positive, neutral, negative} (A3). */
  def classification(text: Column): Column = {
    val ss = sentences(text)
    val pos = aggregate(ss, lit(0.0), (acc, s) => acc + sentenceScore(s))
    val neg = aggregate(ss, lit(0.0),
      (acc, s) => acc + (lit(1.0) - sentenceScore(s)))
    struct(round(pos, 4).as("positive"), lit(0.0).as("neutral"),
      round(neg, 4).as("negative"))
  }

  /** Full chain in W1 priority order: trim → flags → classification. */
  def enrich(articles: DataFrame): DataFrame = {
    val trimmed = trim(col("text"))
    articles
      .withColumn("text", trimmed)
      .withColumn("triggerwords", KeywordFlags.triggerWordsMap(trimmed))
      .withColumn("classification", classification(trimmed))
  }
}
