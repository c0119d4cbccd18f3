package graft.segment

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Segment

/**
 * T11 per-segment summarization (SURVEY.md §2.2) — the deterministic
 * replacement for the reference's LLM summarizer
 * (src/text_processing/text_summarizer.py:244-345): keyword extraction is
 * top-k terms by frequency against a broadcast stop-lexicon, the summary
 * is the first sentence, the role is a rule on segment position. Segments
 * shorter than 10 chars are skipped exactly as the reference does
 * (text_summarizer.py:267-269).
 *
 * The reference's md5 summary cache (S13, text_summarizer.py:86-185)
 * becomes dedup-before-compute: identical (text, type, lang) keys are
 * summarized once and joined back — the set-oriented form of memoization.
 */
object Summarizer {

  val SkipShorterThan = 10
  val TopKeywords = 5

  val StopWords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "be", "are", "was",
    "def", "val", "var", "class", "import", "package", "extends", "return",
    "int", "x")

  /** One summary row per distinct cache key; segments map back via key. */
  def summarize(segments: Dataset[Segment]): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._

    val keyed = segments.toDF()
      .where(length(trim($"text")) >= SkipShorterThan)
      .withColumn("cacheKey", md5(concat_ws("|", $"text", $"segType", $"lang")))

    // dedup-before-compute (the cache semantics, set-oriented)
    val distinctSegs = keyed.select($"cacheKey", $"text", $"segType", $"level", $"start")
      .dropDuplicates("cacheKey")

    // keywords: explode → filter stop lexicon → count → top-k per segment
    val tokens = distinctSegs
      .select($"cacheKey", explode(split(lower($"text"), "[^a-z0-9_]+")).as("tok"))
      .where(length($"tok") > 2 && !$"tok".isin(StopWords.toSeq: _*))
    val w = Window.partitionBy($"cacheKey").orderBy(desc("cnt"), asc("tok"))
    val keywords = tokens.groupBy($"cacheKey", $"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopKeywords)
      .groupBy($"cacheKey").agg(collect_list($"tok").as("keywords"))

    val summaries = distinctSegs
      .withColumn("summary",
        regexp_extract($"text", "^(.*?[.!?])\\s", 1))
      .withColumn("summary",
        when(length($"summary") === 0, substring($"text", 1, 120)).otherwise($"summary"))
      .withColumn("role",
        when($"level" === 0, "document")
          .when($"start" === 0, "introduction")
          .otherwise("body"))
      .join(keywords, Seq("cacheKey"), "left")
      .withColumn("keywords", coalesce($"keywords", array().cast("array<string>")))

    keyed.select($"segId", $"cacheKey")
      .join(summaries.select($"cacheKey", $"summary", $"role", $"keywords"), Seq("cacheKey"))
      .drop("cacheKey")
  }
}
