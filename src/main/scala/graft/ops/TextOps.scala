package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * All pure Catalyst expressions (codegen'd string ops) with exact DuckDB
  * twins — no UDFs anywhere.
  */
object TextOps {

  /** Occurrences of a literal substring (non-overlapping):
    * (len(s) − len(replace(s, sub, ''))) / len(sub).
    */
  def substrCount(s: Column, sub: String): Column =
    ((length(s) - length(replace(s, lit(sub), lit("")))) / sub.length).cast("long")

  /** Whitespace word count. */
  def wordCount(text: Column): Column = size(filter(split(text, " "), w => length(w) > 0)).cast("long")

  /** BPE-ish token count: maximal runs of word chars plus single non-space
    * non-word chars (regex token model, counted not materialized).
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** n-gram language-ID heuristic: score common-substring frequencies and
    * pick the argmax class. Deterministic, portable (the testdata text is
    * synthetic; the operator's shape — scored n-gram banks + argmax — is
    * what matters at scale).
    */
  def langIdHeuristic(text: Column): Column = {
    val n = greatest(length(text).cast("double"), lit(1.0))
    val enScore = (substrCount(text, "the ") * 3 + substrCount(text, " and ") * 3) / n
    val vowels = (length(text) - length(translate(text, "aeiou", ""))).cast("double") / n
    when(enScore > lit(0.01), lit("en"))
      .when(vowels > lit(0.32), lit("es"))
      .when(vowels > lit(0.28), lit("fr"))
      .when(vowels > lit(0.24), lit("de"))
      .otherwise(lit("zh"))
  }

  /** Quality score ∈ [0,100]: length band + word-shape + stopword ratio −
    * punctuation penalty. Integer-valued output → oracle-exact.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val words = greatest(wordCount(text), lit(1L)).cast("double")
    val meanWordLen = (len - (words - 1)) / words
    val stopRatio = (substrCount(text, "the") + substrCount(text, "a ")).cast("double") / words
    val punct = (length(text) - length(translate(text, ".,!?;:", ""))).cast("double") / greatest(len, lit(1.0))
    val lenBand = when(len >= 200 && len <= 5000, lit(40.0))
      .when(len >= 50, lit(25.0)).otherwise(lit(5.0))
    val shapeBand = when(meanWordLen >= 3.0 && meanWordLen <= 9.0, lit(30.0)).otherwise(lit(10.0))
    val stopBand = when(stopRatio >= 0.05 && stopRatio <= 0.6, lit(30.0)).otherwise(lit(10.0))
    floor(lenBand + shapeBand + stopBand - punct * 100.0).cast("long")
  }

  /** Canonical text normalization (the pre-dedup step of web-corpus
    * pipelines): lowercase, strip the punctuation band, collapse whitespace
    * runs, trim. Pure codegen'd string ops.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(translate(lower(text), ".,!?;:'\"()", ""), " +", " "))

  /** PII scrub: mask email-shaped tokens and dotted-quad IPs (the two
    * patterns a log-derived corpus leaks most). Conservative character
    * classes shared by Java and RE2-style engines so the SQL twin matches.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  /** Gopher-style quality-rule battery (Rae et al. 2021 §A1.1 / RefinedWeb
    * §3.1): the per-document structural filters every published pretraining
    * pipeline runs before dedup — word-count band, mean-word-length band,
    * symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alphabetic-word fraction, and a minimum stop-word count — composed
    * into the keep/drop verdict. Every signal is an exact integer (e6
    * microunits via floor division, never a rounded double), so the DuckDB
    * twin is bit-exact. Pure string expressions; the only higher-order
    * functions run once over per-document-bounded arrays (the split
    * word/line lists), the same cost class as the split itself — at 100 TB
    * this stays one linear map over each document with no shuffle.
    *
    * Input frame must carry (did, raw); emits one row per document.
    */
  def gopherRules(framed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val raw = col("raw")
    val lines = split(raw, "\n")
    val words = filter(split(translate(raw, "\n", " "), " "), w => length(w) > 0)
    val stopWords = Seq("the", "a", "and", "of", "to", "in")
    framed
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("sum_wlen", length(translate(raw, " \n", "")).cast("long"))
      .withColumn("alpha_w", size(filter(words, w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("sym_hits", (length(raw) - length(translate(raw, "#", ""))).cast("long"))
      .withColumn("bullet_l", size(filter(lines, l => l.like("- %"))).cast("long"))
      .withColumn("ell_l", size(filter(lines, l => l.like("%..."))).cast("long"))
      .withColumn("stop_hits", size(filter(words,
        w => stopWords.map(s => w === s).reduce(_ || _))).cast("long"))
      .select(col("did"), col("n_words"), col("stop_hits"),
        expr("sum_wlen * 1000000 div n_words").as("mwl_e6"),
        expr("alpha_w * 1000000 div n_words").as("alpha_e6"),
        expr("sym_hits * 1000000 div n_words").as("sym_e6"),
        expr("bullet_l * 1000000 div n_lines").as("bullet_e6"),
        expr("ell_l * 1000000 div n_lines").as("ellipsis_e6"))
      .withColumn("gopher_pass",
        (col("n_words") >= 10 && col("n_words") <= 1000 &&
          col("mwl_e6") >= 3000000L && col("mwl_e6") <= 10000000L &&
          col("sym_e6") < 100000L && col("bullet_e6") <= 900000L &&
          col("ellipsis_e6") <= 300000L && col("alpha_e6") >= 800000L &&
          col("stop_hits") >= 2L).cast("int"))
  }

  /** Position-weighted token fingerprint: Σ tokens[i]·(i+1) mod 1e9+7 —
    * order-sensitive, overflow-free (tokens < 2^15, positions < 2^20), and
    * exactly computable in SQL via an indexed list transform. A stronger
    * rolling polynomial hash is provided natively by
    * [[graft.functions.TokenFingerprint]] (custom codegen Expression).
    */
  def positionalFingerprint(tokens: Column): Column =
    aggregate(
      zip_with(tokens, sequence(lit(1), size(tokens)), (t, i) => t.cast("long") * i.cast("long")),
      lit(0L), (acc, x) => acc + x) % lit(1000000007L)
}
