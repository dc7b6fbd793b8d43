package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: quality
  * scoring, token counting, language ID, fingerprinting. All are pure
  * column expressions (whole-stage-codegen'd, no UDFs) so they fuse into
  * the scan — at 100 TB these run at parquet read speed.
  */
object Text {

  /** ASCII whitespace characters as an EXPLICIT set (for embedding in
    * character classes): Java's `\s` includes vertical tab (\x0B), RE2's
    * does not — spelling the set out removes the one place the two
    * engines' tokenizers could disagree. The same bytes are a valid
    * class body in both Java regex and RE2.
    */
  val WS = "\\t\\n\\x0B\\f\\r "

  /** One-or-more-whitespace regex built from [[WS]] — valid in both
    * engines.
    */
  val wsRe = s"[$WS]+"

  /** Deterministic whitespace tokenization shared by every operator (and
    * mirrored 1:1 in the DuckDB oracles).
    */
  def tokens(text: Column): Column = split(trim(lower(text)), wsRe)

  /** k-token shingles over a token array column (distinct). The standard
    * unit for n-gram Jaccard / MinHash: shingle cardinality is ~|vocab|^k,
    * so shingle-keyed joins stay sparse even when the vocabulary is tiny.
    */
  def shingleExpr(toksCol: String, k: Int): String =
    s"""array_distinct(transform(
       sequence(1, greatest(size($toksCol) - ${k - 1}, 1)),
       i -> concat_ws(' ', slice($toksCol, i, $k))))"""

  /** DuckDB twin of [[shingleExpr]] over a text expression. */
  def shingleSql(textExpr: String, k: Int): String = {
    val toks = s"string_split_regex(trim(lower($textExpr)), '$wsRe')"
    s"""list_distinct(list_transform(
       range(1, greatest(len($toks) - ${k - 1}, 1) + 1),
       i -> array_to_string(($toks)[i:i+${k - 1}], ' ')))"""
  }

  /** Per-language marker-word lists for the language-ID heuristic.
    * Deliberately tiny: the operator's value is the *shape* (argmax over
    * per-class token-hit counts, computable in one pass); swapping in real
    * n-gram profiles is a data change, not a code change.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "is", "of", "to"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "ne"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you"))

  private def inList(t: String, words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(s"$t IN (", ", ", ")")

  /** Quality scoring: length, word count, punctuation ratio, stopword
    * ratio, and a composite score. One projection, no shuffle.
    */
  def quality(df: DataFrame, textCol: String = "text", digits: Int = 4): DataFrame = {
    val stop = langMarkers.flatMap(_._2).distinct.sorted
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_chars_calc", length(col(textCol)))
      .withColumn("word_count", size(col("__toks")))
      .withColumn("punct_count",
        length(regexp_replace(col(textCol), s"[\\w$WS]", "")))
      .withColumn("stop_count",
        expr(s"size(filter(__toks, t -> ${inList("t", stop)}))"))
      .withColumn("punct_ratio",
        round(col("punct_count") / col("n_chars_calc"), digits))
      .withColumn("stop_ratio",
        round(col("stop_count") / col("word_count"), digits))
      // Composite uses the RAW ratios (not the display-rounded columns):
      // rounding pre-rounded values lands exactly on .00005 decimal
      // boundaries where engines' double-rounding can disagree by 1 ulp.
      .withColumn("quality_score", round(
        least(col("word_count") / lit(100.0), lit(1.0)) * 0.5
          + (lit(1.0) - col("punct_count") / col("n_chars_calc")) * 0.25
          + (col("stop_count") / col("word_count")) * 0.25, digits))
      .drop("__toks")
  }

  /** Token counting: whitespace tokens + a BPE-ish segmentation count
    * (letter runs / digit runs / single punctuation marks — the classic
    * pre-tokenizer regex).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("bpe_tokens",
        regexp_count(lower(col(textCol)), lit(s"[a-z]+|[0-9]+|[^a-z0-9$WS]")))

  /** Language ID: argmax of marker-word hit counts, ties broken by
    * language-code order. Single pass; the per-language counts are
    * independent filters over the same token array.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(col(textCol)))
    val withHits = langMarkers.foldLeft(withToks) { case (d, (lang, words)) =>
      d.withColumn(s"hits_$lang",
        expr(s"size(filter(__toks, t -> ${inList("t", words)}))"))
    }
    val langs = langMarkers.map(_._1)
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives earlier languages priority on ties (deterministic).
    withHits.withColumn("pred_lang", pred).drop("__toks")
  }

  /** Document fingerprinting by winnowing (Schleimer et al., SIGMOD '03):
    * k-token shingles → 32-bit cross-engine hashes → min hash per sliding
    * window of w. Emits the distinct fingerprint count and the global min
    * fingerprint per document — a compact near-dup signal. Pure
    * expressions; the rolling structure is built with `sequence`/
    * `transform` so it stays in codegen, and the hash is the md5-derived
    * H32 so the DuckDB oracle reproduces it exactly.
    */
  def fingerprint(df: DataFrame, textCol: String = "text",
                  k: Int = 3, w: Int = 4): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__shingle_hashes",
        expr(s"""transform(
             sequence(1, greatest(size(__toks) - ${k - 1}, 1)),
             i -> ${graft.dedup.MinHashSpec.h32Expr(df.sparkSession,
               s"concat_ws(' ', slice(__toks, i, $k))")})"""))
      .withColumn("__window_mins",
        expr(s"""transform(
             sequence(1, greatest(size(__shingle_hashes) - ${w - 1}, 1)),
             i -> array_min(slice(__shingle_hashes, i, $w)))"""))
      .withColumn("n_fingerprints", size(array_distinct(col("__window_mins"))))
      .withColumn("min_fingerprint", array_min(col("__window_mins")))
      .drop("__toks", "__shingle_hashes", "__window_mins")

  /** Canonical text normalization for fuzzy-exact dedup: lowercase,
    * strip punctuation (non-word, non-space), collapse whitespace runs,
    * trim. The standard first pass of LLM corpus dedup — catches
    * case/spacing/punctuation variants that md5-exact misses. Pure
    * expression; [[normalizeSql]] is the byte-identical DuckDB twin.
    * Whitespace is the shared EXPLICIT [[WS]] class, not `\s`: Java's
    * `\s` includes vertical tab (\x0B), RE2's does not — `\s` here would
    * silently diverge the two engines' hashes on \x0B-bearing documents.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), s"[^\\w$WS]", ""), wsRe, " "))

  /** DuckDB twin of [[normalize]]. */
  def normalizeSql(textExpr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($textExpr), '[^\\w$WS]', '', 'g'), '$wsRe', ' ', 'g'))"

  // PII patterns kept to the RE2 ∩ java.util.regex common subset so the
  // Spark and DuckDB sides match byte-for-byte.
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlRe = s"https?://[^$WS]+" // explicit ws class, not \s (see WS)
  val phoneRe = "\\+?\\d[\\d\\- ]{7,}\\d"

  /** PII scrubbing: count and redact emails / URLs / phone-like number
    * runs (URLs first so an email inside a URL is redacted as the URL).
    * Emits counts plus the md5 + length of the scrubbed text — a compact,
    * comparable signature of the redaction output. One projection, no
    * shuffle — runs at scan speed on 100 TB.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol), urlRe, "[URL]"),
        emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)))
      .withColumn("n_urls", regexp_count(col(textCol), lit(urlRe)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phoneRe)))
      .withColumn("scrubbed_hash", md5(scrubbed))
      .withColumn("scrub_len", length(scrubbed))
  }

  /** DuckDB oracle for [[piiScrub]] over a documents table. (DuckDB
    * single-quoted strings take backslashes literally, so the Scala
    * pattern strings embed as-is.)
    */
  def piiScrubSql(table: String = "documents", idCol: String = "doc_id",
                  textCol: String = "text"): String = {
    val scrub = s"regexp_replace(regexp_replace(regexp_replace($textCol, " +
      s"'$urlRe', '[URL]', 'g'), '$emailRe', '[EMAIL]', 'g'), " +
      s"'$phoneRe', '[PHONE]', 'g')"
    s"""SELECT $idCol,
         cast(len(regexp_extract_all($textCol, '$emailRe')) as int) AS n_emails,
         cast(len(regexp_extract_all($textCol, '$urlRe')) as int) AS n_urls,
         cast(len(regexp_extract_all($textCol, '$phoneRe')) as int) AS n_phones,
         md5($scrub) AS scrubbed_hash,
         cast(length($scrub) as int) AS scrub_len
       FROM $table"""
  }

  /** Corpus n-gram frequency: top bigrams across all documents — the
    * vocabulary/statistics pass of a training-data pipeline. One explode
    * + one shuffle; top-k via TakeOrderedAndProject, never a full sort.
    */
  def ngramFreq(df: DataFrame, textCol: String = "text", n: Int = 2,
                topK: Int = 20): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .select(explode(expr(shingleExpr("__toks", n))).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("ngram"))
      .limit(topK)

  /** DuckDB oracle for [[ngramFreq]]. */
  def ngramFreqSql(table: String = "documents", textCol: String = "text",
                   n: Int = 2, topK: Int = 20): String =
    s"""WITH grams AS (
      SELECT unnest(${shingleSql(textCol, n)}) AS ngram FROM $table)
    SELECT ngram, count(*) AS n_docs FROM grams
    GROUP BY ngram ORDER BY n_docs DESC, ngram LIMIT $topK"""

  /** DuckDB oracle for [[fingerprint]]: (doc_id, n_fingerprints,
    * min_fingerprint) over a documents table.
    */
  def fingerprintSql(table: String = "documents", idCol: String = "doc_id",
                     textCol: String = "text", k: Int = 3, w: Int = 4): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH sh AS (
      SELECT $idCol,
        list_transform(
          range(1, greatest(len($toks) - ${k - 1}, 1) + 1),
          i -> ${graft.dedup.MinHashSpec.duckH32Sql(s"array_to_string(($toks)[i:i+${k - 1}], ' ')")}) AS hs
      FROM $table
    ), wm AS (
      SELECT $idCol,
        list_transform(
          range(1, greatest(len(hs) - ${w - 1}, 1) + 1),
          i -> list_min(hs[i:i+${w - 1}])) AS mins
      FROM sh
    )
    SELECT $idCol,
           cast(len(list_distinct(mins)) as int) AS n_fingerprints,
           list_min(mins) AS min_fingerprint
    FROM wm"""
  }
}
