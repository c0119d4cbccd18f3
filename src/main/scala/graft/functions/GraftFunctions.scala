package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL surface for the native kernels: every graft Catalyst expression is
 * callable from `spark.sql` — either by adding
 * `spark.sql.extensions=graft.functions.GraftExtensions` at session
 * build (the supported production wiring) or by calling
 * [[GraftFunctions.register]] on a live session. A user of the reference
 * can run the same scalar operations from pure SQL without touching the
 * Scala API.
 */
object GraftFunctions {

  private def litInt(e: Expression, arg: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  private def litString(e: Expression, arg: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string literal, got $other")
  }

  private def litLong(e: Expression, arg: String): Long = e match {
    case Literal(l: Long, _) => l
    case Literal(i: Int, IntegerType) => i.toLong
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  /** name → (usage, builder). Literal-only parameters (k, n, patterns)
    * are extracted at resolution time — they parameterize the kernel, not
    * the data path.
    */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_similarity", "graft_similarity(a, b) - Ratcliff-Obershelp ratio",
      (cs: Seq[Expression]) => SimilarityScore(cs(0), cs(1))),
    ("graft_similarity_accept", "graft_similarity_accept(a, b) - adjudication rule",
      (cs: Seq[Expression]) => SimilarityAccept(cs(0), cs(1))),
    ("graft_minhash", "graft_minhash(text, k, n) - k minhashes over word n-gram shingles",
      (cs: Seq[Expression]) => MinHashSignature(cs(0), litInt(cs(1), "k"), litInt(cs(2), "n"))),
    ("graft_shingle_hashes", "graft_shingle_hashes(text, n) - distinct shingle xxhash64s",
      (cs: Seq[Expression]) => ShingleHashes(cs(0), litInt(cs(1), "n"))),
    ("graft_simhash64", "graft_simhash64(text) - 64-bit simhash fingerprint",
      (cs: Seq[Expression]) => SimHash64(cs(0))),
    ("graft_regex_any", "graft_regex_any(arr, pattern) - any element matches the regex",
      (cs: Seq[Expression]) => RegexAnyMatch(cs(0), litString(cs(1), "pattern"))),
    ("graft_hyperplane_sigs", "graft_hyperplane_sigs(vec, nBands, rBits) - LSH band signatures",
      (cs: Seq[Expression]) => HyperplaneSignatures(cs(0), litInt(cs(1), "nBands"), litInt(cs(2), "rBits"))),
    ("graft_dot", "graft_dot(a, b) - dot product of double arrays",
      (cs: Seq[Expression]) => DotProduct(cs(0), cs(1))),
    ("graft_array_eq_count", "graft_array_eq_count(a, b) - positions with equal values",
      (cs: Seq[Expression]) => ArrayEqCount(cs(0), cs(1))),
    ("graft_lang_guess", "graft_lang_guess(text) - (lang, hits) stopword-lexicon argmax",
      (cs: Seq[Expression]) => LangGuess(cs(0),
        graft.ops.TextAnalysis.StopwordLexicon.toSeq.sortBy(_._1), 1000)),
    ("graft_token_chain_hash",
      "graft_token_chain_hash(text, seed) - chained-xxhash64 token-stream fingerprint",
      (cs: Seq[Expression]) => TokenChainHash(cs(0), litLong(cs(1), "seed"))),
    ("graft_token_stats",
      "graft_token_stats(text) - (n_tokens, n_unique, n_stopwords, n_punct, subword_splits)",
      (cs: Seq[Expression]) => TokenStats(cs(0), graft.ops.TextAnalysis.StopwordLexicon("en")))
  )

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point: registers every graft function at
  * session build time (survives `newSession()`, visible to pure-SQL
  * users and thrift/connect clients).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}
