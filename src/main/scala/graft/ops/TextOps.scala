package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization counts, quality scoring, language ID, fingerprinting.
  *
  * All of these are compositions of codegen'd native functions (no UDFs):
  * per-row, shuffle-free, and safe to run over 100 TB of documents as a
  * single map stage fused into the parquet scan.
  */
object TextOps {

  /** Lowercased, whitespace-collapsed canonical text. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Whitespace token array of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-ish token count: runs of letters, runs of digits,
    * and single other non-space characters each count as one token. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Content fingerprint: md5 of the normalized text — the distributed
    * equivalent of a rolling content hash for exact-dup detection. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 64-bit-ish (60-bit, sign-safe) numeric fingerprint, usable as a
    * cheap shard/bucket key. */
  def fingerprint60(text: Column): Column =
    conv(substring(fingerprint(text), 1, 15), 16, 10).cast("long")

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()\\-]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of tokens that are common-English stopwords. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  def stopwordRatio(text: Column): Column = {
    val hits = size(array_intersect(tokens(text),
      array(EnglishStopwords.map(lit): _*)))
    // array_intersect counts distinct hits; good enough as a signal and
    // identical across engines.
    hits.cast("double") / greatest(tokenCount(text), lit(1)).cast("double")
  }

  /** Mean token length over whitespace tokens. */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(normalized(text), " ", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite document-quality score in [0, 1]: rewards mid-length
    * documents with word-like tokens and some stopword mass — the usual
    * cheap pre-filter before expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    // Integer point sum with one final division: exact and identical
    // across engines (float literal addition is not — DuckDB types 0.4
    // as DECIMAL, Spark as double).
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 10.0 && nTok <= 100000.0, 4).otherwise(0)
    val tokenShape = when(avgTokenLength(text) >= 2.0 && avgTokenLength(text) <= 12.0, 3)
      .otherwise(0)
    val stopMass = when(stopwordRatio(text) >= 0.01, 2).otherwise(0)
    val punctOk = when(punctRatio(text) <= 0.2, 1).otherwise(0)
    (lengthOk + tokenShape + stopMass + punctOk).cast("double") / lit(10.0)
  }

  /** Tiny per-language marker vocabularies for heuristic language ID.
    * A real deployment would use char-ngram profiles; the shape of the
    * computation (per-row argmax over marker hit counts) is the same. */
  val LanguageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "en", "un", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"),
    "it" -> Seq("il", "la", "di", "che", "e", "per", "un", "del", "con", "non"))

  /** Heuristic language ID: argmax of marker hits, alphabetical
    * tie-break, "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = LanguageMarkers.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, markers), i) =>
        struct(
          size(array_intersect(toks, array(markers.map(lit): _*))).as("hits"),
          lit(-i).as("neg_rank"), // struct compare: max hits, then lowest
          lit(lang).as("lang"))   // alphabetical index wins ties
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Enrich a documents table with all text-analysis columns. */
  /** PII redaction: emails, IPv4 addresses, and phone-like digit runs
    * are replaced by typed placeholder tokens, in that order (emails
    * first so their local part isn't half-eaten by the phone rule).
    * A chain of codegen'd regexp_replace calls — one map pass, no UDF.
    * Patterns stay in the Java∩RE2 regex subset so the DuckDB oracle
    * replays them verbatim. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d -]{7,}\\d", "<PHONE>")
  }

  /** Gopher-style rule-based quality signals (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", arXiv:2112.11446, Table A1) — the cheap pre-model
    * document filter every large crawl pipeline runs first:
    *
    *   - `n_words`, `mean_word_len` (×1000, integral — see below);
    *   - `n_symbols`: '#' occurrences + '...'/'…' ellipsis runs
    *     (symbol-to-word ratio rule);
    *   - `n_lines`, `n_bullet_lines` (lines starting with a bullet
    *     marker), `n_ellipsis_lines` (lines ending in an ellipsis);
    *   - `n_alpha_words`: words containing ≥1 [a-z] letter;
    *   - `n_stop_hits`: distinct hits in the 8-word Gopher stop set
    *     (the "contains ≥2 of ..." rule);
    *   - `keep`: the conjunction of the paper's thresholds, evaluated
    *     in EXACT integer arithmetic (cross-multiplied ratios — e.g.
    *     symbols/words ≤ 0.1 tested as 10·symbols ≤ words), so the
    *     flag is bit-identical on every engine — no float ratio ever
    *     thresholded.
    *
    * mean_word_len is emitted ×1000 floor-divided (integral) rather
    * than as an IEEE ratio purely so EVERY output column stays integer
    * — one convention for the whole row beats one exact-but-odd
    * double. Thresholds are the paper's, parameterized; the word
    * bounds default to the paper's [50, 100000].
    *
    * Scale shape: a single map pass of codegen'd regexp counts fused
    * into the scan — no shuffle, no UDF. NULL text yields NULL signals
    * and keep=false (no evidence — the corpus discipline).
    */
  def gopherSignals(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks).cast("long")
    val nChars = length(regexp_replace(normalized(t), " ", "")).cast("long")
    val nSymbols = (regexp_count(t, lit("#")) +
      regexp_count(t, lit("\\.\\.\\.|…"))).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      trim(l).rlike("^([-*•]|[0-9]+[.)])\\s"))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = size(array_intersect(toks,
      array(stops.map(lit): _*))).cast("long")
    // Every ratio rule cross-multiplied to integer compares:
    //   mean word len in [3, 10]   ⇔ 3·words ≤ chars ≤ 10·words
    //   symbol ratio ≤ 0.1         ⇔ 10·symbols ≤ words
    //   bullet lines ≤ 90%         ⇔ 10·bullets ≤ 9·lines
    //   ellipsis lines ≤ 30%       ⇔ 10·ellipsis ≤ 3·lines
    //   alpha-word fraction ≥ 0.8  ⇔ 5·alpha ≥ 4·words
    val keep = t.isNotNull &&
      nWords >= minWords && nWords <= maxWords &&
      nChars >= lit(3L) * nWords && nChars <= lit(10L) * nWords &&
      lit(10L) * nSymbols <= nWords &&
      lit(10L) * nBullet <= lit(9L) * nLines &&
      lit(10L) * nEllipsis <= lit(3L) * nLines &&
      lit(5L) * nAlpha >= lit(4L) * nWords &&
      nStop >= 2L
    df.select(col(idCol),
      when(t.isNotNull, nWords).as("n_words"),
      when(t.isNotNull, nChars).as("__nchars"),
      when(t.isNotNull, nSymbols).as("n_symbols"),
      when(t.isNotNull, nLines).as("n_lines"),
      when(t.isNotNull, nBullet).as("n_bullet_lines"),
      when(t.isNotNull, nEllipsis).as("n_ellipsis_lines"),
      when(t.isNotNull, nAlpha).as("n_alpha_words"),
      when(t.isNotNull, nStop).as("n_stop_hits"),
      coalesce(keep, lit(false)).as("keep"))
      .withColumn("mean_word_len_x1000",
        expr("(__nchars * 1000) div greatest(n_words, 1L)"))
      .select(col(idCol), col("n_words"), col("mean_word_len_x1000"),
        col("n_symbols"), col("n_lines"), col("n_bullet_lines"),
        col("n_ellipsis_lines"), col("n_alpha_words"), col("n_stop_hits"),
        col("keep"))
  }

  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_re_tokens", regexTokenCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("avg_token_len", avgTokenLength(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("lang_pred", langId(t))
  }
}
