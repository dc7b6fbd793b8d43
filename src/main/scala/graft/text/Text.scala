package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.Checkpoints.CutSyntax

/** Text-analysis operators for LLM training-data pipelines: quality
  * scoring, token counting, language ID, fingerprinting. All are pure
  * column expressions (whole-stage-codegen'd, no UDFs) so they fuse into
  * the scan — at 100 TB these run at parquet read speed.
  *
  * The lineage cuts in this file (postings, LM count and n-gram
  * frames; `cutLineage()`, [[graft.config.Checkpoints]]) follow the
  * SURVEY §5 cluster-loss contract: executor-local `localCheckpoint`
  * by default — on a preemptible cluster set
  * `graft.checkpoint=reliable` (+ `setCheckpointDir`) to make every
  * cut recoverable.
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
    // the trailing filter is the NULL/empty-text contract at the
    // shingle layer: a doc with zero real tokens tokenizes to [""]
    // (trim+split of null/empty/whitespace), and the greatest(...,1)
    // partial-shingle rule would hand every such doc the SAME
    // one-element shingle set — jaccard 1.0 between any two degenerate
    // docs, so the whole near-dup stack (LSH buckets, verify,
    // contamination grams) would merge missing payloads as
    // "duplicates". No real tokens → NO shingles: degenerate docs are
    // invisible to every shingle-based operator on both engines.
    // `trim(s) != ''`, not `s != ''`: trim() is SPACE-only in both
    // engines, so tab/newline-only text tokenizes to ["",""] whose
    // single shingle is " " — a bare non-empty check let every
    // tab-only doc share that one shingle (one false near-dup class,
    // and in streaming LSH one C(m,2) bucket bomb per band; ADVICE
    // r11). Tokens themselves can never contain whitespace (they are
    // split products), so a shingle's only whitespace is its space
    // joiners: space-trim exactly isolates the degenerate case. Docs
    // with ≥1 real token are untouched (their slices are never
    // all-empty).
    s"""filter(array_distinct(transform(
       sequence(1, greatest(size($toksCol) - ${k - 1}, 1)),
       i -> concat_ws(' ', slice($toksCol, i, $k)))), s -> trim(s) != '')"""

  /** DuckDB twin of [[shingleExpr]] over a text expression. */
  def shingleSql(textExpr: String, k: Int): String = {
    val toks = s"string_split_regex(trim(lower($textExpr)), '$wsRe')"
    s"""list_filter(list_distinct(list_transform(
       range(1, greatest(len($toks) - ${k - 1}, 1) + 1),
       i -> array_to_string(($toks)[i:i+${k - 1}], ' '))), s -> trim(s) <> '')"""
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
      // halfUp (floor(x·10^d + 0.5)·10^-d), NOT round(): the engines
      // compute the IDENTICAL double here, but Spark's round is exact
      // BigDecimal HALF_UP while DuckDB's is scale-multiply half-even —
      // they disagree whenever the value lands on an exact decimal
      // midpoint, which integer-count ratios genuinely hit (observed at
      // sf0.1: quality_score 0.44+0.25+0.03125 = 0.72125 → 0.7213 vs
      // 0.7212; stop ratios like 9/160 = 0.05625 are the same class).
      // The floor spelling is one deterministic function of the double.
      // nullif on every denominator: empty text (0 chars) and
      // whitespace-only text (0 words) are legal corpus rows, and under
      // ANSI mode a bare /0 would kill the whole job for one such row.
      // DuckDB's division already yields NULL at 0, so null ratios (and
      // a null composite) are the cross-engine contract for these docs.
      .withColumn("punct_ratio",
        halfUp(col("punct_count") / nullif(col("n_chars_calc"), lit(0)),
          digits))
      .withColumn("stop_ratio",
        halfUp(col("stop_count") / nullif(col("word_count"), lit(0)),
          digits))
      // Composite uses the RAW ratios (not the display-rounded columns):
      // rounding pre-rounded values lands exactly on .00005 decimal
      // boundaries where engines' double-rounding can disagree by 1 ulp.
      .withColumn("quality_score", halfUp(
        least(col("word_count") / lit(100.0), lit(1.0)) * 0.5
          + (lit(1.0) - col("punct_count") / nullif(col("n_chars_calc"),
            lit(0))) * 0.25
          + (col("stop_count") / nullif(col("word_count"), lit(0))) * 0.25,
        digits))
      .drop("__toks")
  }

  /** Deterministic half-up rounding of a non-negative double:
    * floor(x·10^d + 0.5)/10^d. Unlike `round`, identical in Spark and
    * DuckDB GIVEN the same input double (see [[quality]]'s note).
    */
  private[graft] def halfUp(c: Column, digits: Int): Column = {
    val scale = math.pow(10.0, digits)
    floor(c * lit(scale) + lit(0.5)) / lit(scale)
  }

  /** DuckDB twin of [[halfUp]]. */
  private[graft] def halfUpSql(e: String, digits: Int): String = {
    val scale = s"1e$digits"
    s"floor(($e) * $scale + 0.5) / $scale"
  }

  /** Token counting: whitespace tokens + a BPE-ish segmentation count
    * (letter runs / digit runs / single punctuation marks — the classic
    * pre-tokenizer regex).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("bpe_tokens",
        regexp_count(lower(col(textCol)), lit(s"[a-z]+|[0-9]+|[^a-z0-9$WS]")))

  /** Sliding-window CHUNKING: split each document into ≤ `chunkSize`
    * token windows advancing by `chunkSize − overlap` — the
    * context-window preparation step between cleaning and sequence
    * packing (a doc longer than the model context is chunked with
    * overlap so no span is ever cut without context; chunks then feed
    * [[graft.etl.Sampling.packSequences]]). Uses the library-wide
    * [[tokens]] contract, so `n_toks` agrees with [[tokenCounts]]'
    * `ws_tokens` and the chunk text is the normalized token stream.
    *
    * Chunk count is 1 + ⌈(n − size) / stride⌉ (never 0: an empty doc is
    * one empty chunk, the [[bm25]] one-empty-token convention), all in
    * integer arithmetic — both engines compute the identical count, and
    * the per-chunk slice bounds are driver literals in the expression.
    * Pure projection + bounded explode (output rows ≈ n_tokens/stride
    * per doc): one scan, no shuffle, embarrassingly parallel at any
    * corpus size.
    */
  def chunk(df: DataFrame, chunkSize: Int = 64, overlap: Int = 16,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"chunk: need 0 <= overlap < chunkSize, got $overlap / $chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__nc",
        when(col("__n") <= chunkSize, lit(1L)).otherwise(
          expr(s"(__n - $chunkSize + ${stride - 1}) div $stride") + 1L))
      .select(col(idCol), col("__toks"),
        posexplode(expr("sequence(0, __nc - 1)")).as(Seq("__pos", "chunk_idx")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("int").as("start_tok"),
        expr(s"slice(__toks, chunk_idx * $stride + 1, $chunkSize)").as("__sl"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__sl")).as("n_toks"),
        array_join(col("__sl"), " ").as("chunk_text"))
  }

  /** DuckDB oracle for [[chunk]] — identical tokenization, integer
    * chunk-count arithmetic, and inclusive-bound slices.
    */
  def chunkSql(chunkSize: Int = 64, overlap: Int = 16,
               table: String = "documents", idCol: String = "doc_id",
               textCol: String = "text"): String = {
    val stride = chunkSize - overlap
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH t AS (
         SELECT $idCol, $toks AS toks, len($toks) AS n FROM $table),
       c AS (
         SELECT $idCol, toks,
                CASE WHEN n <= $chunkSize THEN 1
                     ELSE ((n - $chunkSize + ${stride - 1}) // $stride) + 1
                END AS nc
         FROM t),
       x AS (
         SELECT $idCol, toks, unnest(range(0, nc)) AS chunk_idx FROM c),
       sl AS (
         SELECT $idCol, chunk_idx,
                toks[chunk_idx * $stride + 1 : chunk_idx * $stride + $chunkSize]
                  AS sl
         FROM x)
       SELECT $idCol, cast(chunk_idx as int) AS chunk_idx,
              cast(chunk_idx * $stride as int) AS start_tok,
              cast(len(sl) as int) AS n_toks,
              array_to_string(sl, ' ') AS chunk_text
       FROM sl"""
  }

  /** DuckDB (idCol, quality_score) fragment with [[quality]]'s exact
    * formula and operation order — usable as a CTE body wherever an
    * oracle needs the composite score (e.g. quality-aware dedup
    * survivor selection). The composite uses RAW ratios, rounding once
    * at the end, for the same 1-ulp midpoint reason as [[quality]].
    */
  def qualityScoreSql(table: String = "documents", idCol: String = "doc_id",
                      textCol: String = "text", digits: Int = 4): String = {
    val stopList =
      langMarkers.flatMap(_._2).distinct.sorted.map(w => s"'$w'").mkString(", ")
    s"""SELECT $idCol,
         ${halfUpSql(
           """least(word_count / 100.0, 1.0) * 0.5
               + (1.0 - punct_count / cast(n_chars as double)) * 0.25
               + (stop_count / cast(word_count as double)) * 0.25""", digits)}
           AS quality_score
       FROM (
         SELECT $idCol,
                cast(length($textCol) as int) AS n_chars,
                cast(len(__toks) as int) AS word_count,
                cast(length(regexp_replace($textCol, '[\\w$WS]', '', 'g')) as int)
                  AS punct_count,
                cast(len(list_filter(__toks, x -> x IN ($stopList))) as int)
                  AS stop_count
         FROM (SELECT $idCol, $textCol,
                      string_split_regex(trim(lower($textCol)), '$wsRe') AS __toks
               FROM $table))"""
  }

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

  /** Benchmark decontamination screen — the standard eval-set
    * contamination pass of an LLM training-data pipeline: flag corpus
    * documents sharing any n-token shingle with a benchmark/eval
    * document, so train/test leakage is removed before training.
    * Output is dense (one row per corpus doc): the distinct
    * contaminated-shingle count and a 0/1 flag.
    *
    * Spark shape for 100 TB: the benchmark's distinct shingles are a
    * SMALL frame (eval sets are tiny next to the corpus) and are
    * broadcast — the corpus-side shingle explode is filtered by the
    * broadcast hash join BEFORE any shuffle, so the only shuffled rows
    * are actual hits (grouped per doc), plus the bounded hits frame
    * joined back for the dense zero-fill. The corpus is scanned twice
    * (grams + id spine), both scans pruned to the needed columns.
    * Grams join as the 62-bit cross-engine content fingerprint, not as
    * strings: the broadcast table holds 8 bytes per benchmark shingle
    * instead of ~50, and the probe is an integer compare — collisions
    * are ~|bench|·|corpus grams|/2^62, negligible at any real scale
    * (and both engines hash identically, so the oracle match is exact
    * by construction either way).
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val fp = graft.dedup.MinHashSpec.fingerprint62Expr(spark, "gram")
    val bGrams = benchmark
      .withColumn("__toks", tokens(col(textCol)))
      .select(explode(expr(shingleExpr("__toks", n))).as("gram"))
      .select(expr(fp).as("gram_fp"))
      .distinct()
    val dGrams = docs
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(expr(shingleExpr("__toks", n))).as("gram"))
      .select(col(idCol), expr(fp).as("gram_fp"))
    val hits = dGrams.join(broadcast(bGrams), Seq("gram_fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_contaminated"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated"), lit(0)).as("n_contaminated"),
        when(coalesce(col("n_contaminated"), lit(0)) > 0, 1).otherwise(0)
          .as("contaminated"))
  }

  /** DuckDB oracle for [[contamination]] with the benchmark defined by
    * a predicate over the same table (the gate plants every 50th doc as
    * the "eval set"; a production run passes a real benchmark table).
    */
  def contaminationSql(table: String = "documents",
                       benchPredicate: String = "doc_id % 50 = 0",
                       n: Int = 8, idCol: String = "doc_id",
                       textCol: String = "text",
                       distinctFps: Boolean = false): String = {
    // distinctFps: the streaming twin counts DISTINCT contaminated
    // fingerprints per doc (array_intersect semantics) — identical to
    // the per-gram count unless two of a doc's grams collide in 62 bits
    val cnt = if (distinctFps) "count(DISTINCT g.gram_fp)" else "count(*)"
    s"""WITH bench AS (
         SELECT DISTINCT ${graft.dedup.MinHashSpec.duckFingerprint62Sql("gram")}
                  AS gram_fp
         FROM (SELECT unnest(${shingleSql(textCol, n)}) AS gram
               FROM $table WHERE $benchPredicate)),
       grams AS (
         SELECT $idCol,
                ${graft.dedup.MinHashSpec.duckFingerprint62Sql("gram")}
                  AS gram_fp
         FROM (SELECT $idCol, unnest(${shingleSql(textCol, n)}) AS gram
               FROM $table)),
       hits AS (
         SELECT g.$idCol, cast($cnt as int) AS n_contaminated
         FROM grams g JOIN bench b USING (gram_fp) GROUP BY g.$idCol)
     SELECT d.$idCol,
            coalesce(h.n_contaminated, 0) AS n_contaminated,
            CASE WHEN coalesce(h.n_contaminated, 0) > 0
                 THEN 1 ELSE 0 END AS contaminated
     FROM $table d LEFT JOIN hits h USING ($idCol)"""
  }

  /** k-token shingles WITHOUT the distinct — repetition statistics need
    * every occurrence (the dedup/MinHash ops use [[shingleExpr]]'s
    * distinct variant).
    */
  def ngramAllExpr(toksCol: String, k: Int): String =
    s"""transform(
       sequence(1, greatest(size($toksCol) - ${k - 1}, 1)),
       i -> concat_ws(' ', slice($toksCol, i, $k)))"""

  /** DuckDB twin of [[ngramAllExpr]]. */
  def ngramAllSql(textExpr: String, k: Int): String = {
    val toks = s"string_split_regex(trim(lower($textExpr)), '$wsRe')"
    s"""list_transform(
       range(1, greatest(len($toks) - ${k - 1}, 1) + 1),
       i -> array_to_string(($toks)[i:i+${k - 1}], ' '))"""
  }

  /** PMI collocation mining (Church & Hanks 1990): the corpus's top
    * `topK` two-word collocations by pointwise mutual information
    * ln(P(ab)/(P(a)P(b))), with a `minCount` floor (raw PMI maximally
    * rewards hapax pairs — the floor is part of the method). The
    * vocabulary-statistics companion of [[ngramFreq]] (which ranks by
    * raw count): PMI surfaces *associated* pairs, not merely frequent
    * ones — tokenizer and corpus-composition diagnostics.
    *
    * Engine-exactness without overflow: PMI decomposes as
    * ln c_ab + 2·ln N₁ − ln c_a − ln c_b − ln N₂; each factor is
    * quantized to integer micro-nats INDIVIDUALLY and the score is
    * their integer sum — no cross-product ever forms (the ratio form
    * needs c_ab·N₁² which overflows even HUGEINT at web scale), and
    * the ranking (score DESC, pair ASC) is a total integer order. The
    * ≤ 5 µnat quantization skew is three orders below any real PMI
    * difference. Shape: the [[repetition]] tagged single explode (one
    * corpus scan for both unigram and bigram counts), bounded joins on
    * the vocab, global top-k via TakeOrderedAndProject.
    */
  def collocations(df: DataFrame, topK: Int = 20, minCount: Int = 5,
                   textCol: String = "text"): DataFrame = {
    def lnMicro(c: Column): Column =
      floor(log(c.cast("double")) * lit(1000000.0))
    val tagged = df
      .select(tokens(col(textCol)).as("__toks"))
      .select(explode(expr(
        s"""concat(
           transform(__toks, t -> named_struct('tag', 1, 'term', t)),
           transform(${ngramAllExpr("__toks", 2)},
             b -> named_struct('tag', 2, 'term', b)))""")).as("tt"))
      .select(col("tt.tag").as("tag"), col("tt.term").as("term"))
    // consumed three times (totals, unigram side, bigram side)
    val counts = tagged.groupBy(col("tag"), col("term"))
      .agg(count(lit(1)).as("c")).cutLineage()
    val totals = counts.groupBy(col("tag")).agg(sum(col("c")).as("n"))
    val n1 = totals.filter(col("tag") === 1).select(col("n").as("n_uni"))
    val n2 = totals.filter(col("tag") === 2).select(col("n").as("n_bi"))
    val uni = counts.filter(col("tag") === 1)
      .select(col("term").as("w"), col("c"))
    val bi = counts.filter(col("tag") === 2 && col("c") >= minCount)
      .select(split(col("term"), " ").as("__p"), col("c").as("n_pair"))
      .select(col("__p")(0).as("w1"), element_at(col("__p"), 2).as("w2"),
        col("n_pair"))
      .filter(col("w2").isNotNull) // degenerate 1-token "bigrams" drop
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("w1"), col("w2"), col("n_pair"),
        (lnMicro(col("n_pair")) + lit(2L) * lnMicro(col("n_uni"))
          - lnMicro(col("c1")) - lnMicro(col("c2")) - lnMicro(col("n_bi")))
          .as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** DuckDB oracle for [[collocations]] — identical tokenization,
    * per-factor micro-nat quantization, and total ranking order.
    */
  def collocationsSql(topK: Int = 20, minCount: Int = 5,
                      table: String = "documents",
                      textCol: String = "text"): String = {
    def lnMicro(c: String): String =
      s"cast(floor(ln(cast($c as double)) * 1000000.0) as bigint)"
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH t AS (SELECT $toks AS tk FROM $table),
       uni AS (SELECT unnest(tk) AS term FROM t),
       big AS (
         SELECT unnest(list_transform(
             range(1, greatest(len(tk) - 1, 1) + 1),
             i -> array_to_string(tk[i:i+1], ' '))) AS term
         FROM t),
       cu AS (SELECT term, cast(count(*) as bigint) AS c FROM uni GROUP BY term),
       cb AS (SELECT term, cast(count(*) as bigint) AS c FROM big GROUP BY term),
       n1 AS (SELECT cast(sum(c) as bigint) AS n_uni FROM cu),
       n2 AS (SELECT cast(sum(c) as bigint) AS n_bi FROM cb),
       pairs AS (
         SELECT string_split(term, ' ')[1] AS w1,
                string_split(term, ' ')[2] AS w2,
                c AS n_pair
         FROM cb WHERE c >= $minCount AND len(string_split(term, ' ')) = 2)
     SELECT p.w1, p.w2, p.n_pair,
            ${lnMicro("p.n_pair")} + 2 * ${lnMicro("n1.n_uni")}
              - ${lnMicro("u1.c")} - ${lnMicro("u2.c")}
              - ${lnMicro("n2.n_bi")} AS pmi_micro
     FROM pairs p
     JOIN cu u1 ON p.w1 = u1.term
     JOIN cu u2 ON p.w2 = u2.term
     CROSS JOIN n1 CROSS JOIN n2
     ORDER BY pmi_micro DESC, p.w1, p.w2
     LIMIT $topK"""
  }

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1 quality
    * filters, re-expressed relationally): per document, the fraction of
    * token occurrences that are repeats, the share of the most frequent
    * token and bigram, and duplicate-line stats. High values mark
    * boilerplate/spam/degenerate text — the standard repetition screen a
    * training-data pipeline runs alongside [[quality]].
    *
    * Shape at scale: ONE corpus scan, ZERO shuffles. Every statistic
    * here is per-document, so none of them needs an exchange: the
    * max-occurrence counts come from `array_sort` + `aggregate` (max
    * run length in the sorted token/bigram array — a per-row
    * codegen'd fold, no explode, no groupBy), and the type/line
    * counts are `size(array_distinct(...))`. Embarrassingly parallel
    * at any scale — the earlier tagged-explode form (still the right
    * shape for CORPUS-level counts, see [[collocations]]) paid two
    * shuffles and a 2n-row struct explode for stats the row already
    * contained, and its allocation tail was the one multi-second
    * variance outlier in the r6 bench.
    */
  def repetition(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", digits: Int = 4): DataFrame = {
    val lines = split(col(textCol), "\n")
    // Max occurrence count of any element = max run length in the
    // sorted array. Null-safe <=> starts a fresh run on the first
    // element (prev initialises to NULL).
    def maxRepeat(arr: String): Column = expr(
      s"""aggregate(
         array_sort($arr),
         named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
         (a, t) -> named_struct(
           'prev', t,
           'run',  CASE WHEN a.prev <=> t THEN a.run + 1 ELSE 1 END,
           'best', greatest(a.best,
                     CASE WHEN a.prev <=> t THEN a.run + 1 ELSE 1 END)),
         a -> a.best)""")
    df
      .select(col(idCol),
        size(lines).as("n_lines"),
        size(array_distinct(lines)).as("n_distinct_lines"),
        tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("n_lines"), col("n_distinct_lines"),
        col("__toks"), expr(ngramAllExpr("__toks", 2)).as("__bgs"))
      .select(col(idCol), col("n_lines"), col("n_distinct_lines"),
        size(col("__toks")).as("n_tokens"),
        size(array_distinct(col("__toks"))).as("n_types"),
        maxRepeat("__toks").as("top_cnt"),
        size(col("__bgs")).as("n_bigrams"),
        maxRepeat("__bgs").as("top_bg_cnt"))
      .select(col(idCol),
        col("n_tokens").cast("int").as("n_tokens"),
        col("n_types").cast("int").as("n_types"),
        round((col("n_tokens") - col("n_types")) / col("n_tokens"), digits)
          .as("dup_token_frac"),
        round(col("top_cnt") / col("n_tokens"), digits).as("top_token_frac"),
        round(col("top_bg_cnt") / col("n_bigrams"), digits)
          .as("top_bigram_frac"),
        col("n_lines"),
        round((col("n_lines") - col("n_distinct_lines")) / col("n_lines"),
          digits).as("dup_line_frac"))
  }

  /** DuckDB oracle for [[repetition]]. */
  def repetitionSql(table: String = "documents", idCol: String = "doc_id",
                    textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH t AS (
      SELECT $idCol, unnest($toks) AS tok FROM $table
    ), tc AS (
      SELECT $idCol, tok, count(*) AS cnt FROM t GROUP BY 1, 2
    ), ts AS (
      SELECT $idCol, cast(sum(cnt) as bigint) AS n_tokens,
             count(*) AS n_types, max(cnt) AS top_cnt
      FROM tc GROUP BY 1
    ), bgl AS (
      SELECT $idCol, unnest(${ngramAllSql(textCol, 2)}) AS bg FROM $table
    ), bc AS (
      SELECT $idCol, bg, count(*) AS cnt FROM bgl GROUP BY 1, 2
    ), bs AS (
      SELECT $idCol, max(cnt) AS top_bg_cnt,
             cast(sum(cnt) as bigint) AS n_bigrams
      FROM bc GROUP BY 1
    ), ls AS (
      SELECT $idCol,
             len(string_split($textCol, chr(10))) AS n_lines,
             len(list_distinct(string_split($textCol, chr(10)))) AS n_distinct_lines
      FROM $table
    )
    SELECT ls.$idCol,
           cast(ts.n_tokens as int) AS n_tokens,
           cast(ts.n_types as int) AS n_types,
           round((ts.n_tokens - ts.n_types) / cast(ts.n_tokens as double), 4)
             AS dup_token_frac,
           round(ts.top_cnt / cast(ts.n_tokens as double), 4) AS top_token_frac,
           round(bs.top_bg_cnt / cast(bs.n_bigrams as double), 4)
             AS top_bigram_frac,
           cast(ls.n_lines as int) AS n_lines,
           round((ls.n_lines - ls.n_distinct_lines)
             / cast(ls.n_lines as double), 4) AS dup_line_frac
    FROM ls JOIN ts ON ls.$idCol = ts.$idCol
    JOIN bs ON ls.$idCol = bs.$idCol"""
  }

  /** BM25 keyword search (Robertson/Walker Okapi weighting): top-k
    * documents for a bag of query terms. The relational decomposition of
    * an inverted index: postings = one explode filtered to the query
    * vocabulary BEFORE exploding (so the shuffle carries only matching
    * terms, not the corpus), df/idf per term (tiny, broadcast), document
    * lengths carried THROUGH the postings aggregation (`first(dl)`) so no
    * lens join and no second tokenize pass, corpus stats as a broadcast
    * single-row aggregate — no driver-side collect anywhere. Ranking is a
    * global top-k (`TakeOrderedAndProject`), never a full sort.
    *
    * The corpus is tokenized exactly once (the postings scan). The stats
    * aggregate needs only document LENGTHS, and `dl` ==
    * `regexp_count(trimmed, ws+) + 1` == `size(split(trimmed, ws+))`
    * (split keeps trailing empties, so the all-whitespace document is one
    * empty token either way) — a single regex count instead of a second
    * split-and-materialize-the-array pass.
    */
  def bm25(df: DataFrame, queryTerms: Seq[String], idCol: String = "doc_id",
           textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20, digits: Int = 4): DataFrame = {
    val terms = queryTerms.distinct.sorted
    val dlCol = (regexp_count(trim(lower(col(textCol))), lit(wsRe)) + 1)
      .as("dl")
    val stats = df.select(dlCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast("long")).as("total_dl"))
    // Materialized (localCheckpoint, no CacheManager entry): postings is
    // consumed twice (df counts + scoring) and column pruning specializes
    // the two references into different aggregates, so neither Catalyst
    // nor AQE exchange-reuse can share them — without materialization the
    // corpus would be tokenized twice (verified on the executed plan).
    // Postings is the INDEX, not the corpus: one row per (matching doc,
    // query term), bounded by the docs that contain a query term.
    val postings = df
      .select(col(idCol), dlCol, tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("dl"),
        explode(expr(s"filter(__toks, t -> ${inList("t", terms)})")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .cutLineage()
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") /
            (col("total_dl") / col("n_docs")))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), digits).as("score"),
        count(lit(1)).cast("int").as("n_terms_hit"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topK)
  }

  /** DuckDB oracle for [[bm25]] — identical formula, identical
    * tokenization, same round-then-rank ordering.
    */
  def bm25Sql(queryTerms: Seq[String], table: String = "documents",
              idCol: String = "doc_id", textCol: String = "text",
              k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): String = {
    val terms = queryTerms.distinct.sorted
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    val termList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH toks AS (
      SELECT $idCol, $toks AS tt FROM $table
    ), lens AS (
      SELECT $idCol, len(tt) AS dl FROM toks
    ), stats AS (
      SELECT count(*) AS n_docs, cast(sum(dl) as bigint) AS total_dl FROM lens
    ), postings AS (
      SELECT $idCol, term, count(*) AS tf FROM (
        SELECT $idCol, unnest(list_filter(tt, t -> t IN $termList)) AS term
        FROM toks) GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY 1
    ), scored AS (
      SELECT p.$idCol,
        ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
          * (p.tf * ${k1 + 1}) /
          (p.tf + $k1 * (${1 - b} + $b * l.dl /
            (s.total_dl / cast(s.n_docs as double)))) AS w
      FROM postings p
      JOIN dfreq d ON p.term = d.term
      JOIN lens l ON p.$idCol = l.$idCol
      CROSS JOIN stats s
    )
    SELECT $idCol, round(sum(w), 4) AS score,
           cast(count(*) as int) AS n_terms_hit
    FROM scored GROUP BY $idCol
    ORDER BY score DESC, $idCol LIMIT $topK"""
  }

  /** Unigram log-probability scoring — the perplexity-proxy quality
    * filter (the KenLM-filter shape from CCNet, arXiv:1911.00359 §3.3,
    * with the LM reduced to the corpus's own unigram distribution):
    * score(doc) = Σ_tokens ln P(tok), P = corpus unigram frequency.
    * Low-probability-dense documents (gibberish, OCR noise) score far
    * below the corpus mode and are cut by an avg-logprob threshold.
    *
    * Cross-engine determinism: per-token ln P is quantized ONCE per
    * distinct token to integer micro-nats (floor(ln·1e6)), so the
    * per-document aggregation is an order-independent integer sum; the
    * published average divides the integer sum in one fixed IEEE op
    * order. Shape: one token-count shuffle builds the (vocab-sized)
    * frequency table, which broadcasts back onto the token stream —
    * corpus scanned twice, nothing wide ever shuffles on text.
    */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = df.withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(col("__toks")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("total"))
    val scored = freq.crossJoin(broadcast(tot))
      .select(col("tok"),
        floor(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1000000.0)).as("lp_micro"))
    toks.join(broadcast(scored), Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(col("lp_micro")).as("lp_micro_sum"))
      .withColumn("avg_logprob",
        col("lp_micro_sum").cast("double") / col("n_tokens").cast("double")
          / lit(1000000.0))
  }

  /** Interpolated BIGRAM log-probability scoring — [[unigramLogProb]]
    * upgraded to the actual CCNet-style LM filter shape (arXiv:1911.00359
    * §3.3): score(doc) = Σ over adjacent pairs of
    * ln(λ·P(cur|prev) + (1−λ)·P(cur)), with P(cur|prev) =
    * cnt(prev,cur)/cnt(prev) and P(cur) the corpus unigram frequency.
    * The unigram backoff means unseen-context mass never zeroes, and the
    * bigram term catches word-salad documents whose unigram profile
    * looks normal (shuffled text has the same unigram score but
    * improbable transitions).
    *
    * Cross-engine determinism: the interpolated ln is quantized ONCE per
    * DISTINCT bigram to integer micro-nats with one fixed IEEE op order,
    * so per-document aggregation is an order-independent integer sum.
    * Shape: one bigram-count shuffle + one unigram-count shuffle build
    * the LM (both vocabulary-sized); `broadcastLm` joins it back onto
    * the bigram stream (assumes the distinct-bigram table fits an
    * executor — holds for curated corpora; pass false for open-web scale
    * to shuffle-join on (prev, cur) instead). Documents with fewer than
    * two tokens have no bigrams and are absent from the output.
    */
  def bigramLogProb(df: DataFrame, lambda: Double = 0.8,
                    idCol: String = "doc_id", textCol: String = "text",
                    broadcastLm: Boolean = true): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, "bigramLogProb: lambda in (0,1]")
    val base = df.withColumn("__toks", tokens(col(textCol)))
    val toks = base.select(col(idCol), explode(col("__toks")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .cutLineage() // consumed twice (context + backoff joins)
    val tot = uni.agg(sum(col("cnt")).as("total"))
    // adjacent pairs via zip_with of the two shifted slices: empty for
    // 1-token docs with no sequence(1,0)-counts-down hazard
    val bigs = base.select(col(idCol),
        explode(expr(
          """zip_with(slice(__toks, 1, size(__toks) - 1),
                      slice(__toks, 2, size(__toks) - 1),
                      (a, b) -> struct(a as prev, b as cur))""")).as("__bg"))
      .select(col(idCol), col("__bg.prev").as("prev"), col("__bg.cur").as("cur"))
      .cutLineage() // consumed twice (LM counts + scoring join)
    val cb = bigs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
    val scored = cb
      .join(uni.select(col("tok").as("prev"), col("cnt").as("cp")), Seq("prev"))
      .join(uni.select(col("tok").as("cur"), col("cnt").as("cc")), Seq("cur"))
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("cur"),
        floor(log(
          lit(lambda) * (col("cb").cast("double") / col("cp").cast("double"))
            + lit(1.0 - lambda)
              * (col("cc").cast("double") / col("total").cast("double")))
          * lit(1000000.0)).as("lp_micro"))
    val lmSide = if (broadcastLm) broadcast(scored) else scored
    bigs.join(lmSide, Seq("prev", "cur"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum(col("lp_micro")).as("lp_micro_sum"))
      .withColumn("avg_logprob",
        col("lp_micro_sum").cast("double") / col("n_bigrams").cast("double")
          / lit(1000000.0))
  }

  /** DuckDB oracle for [[bigramLogProb]] — identical pair extraction,
    * interpolation op order, micro-nat quantization, and final average.
    */
  def bigramLogProbSql(lambda: Double = 0.8, table: String = "documents",
                       idCol: String = "doc_id",
                       textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH t AS (
      SELECT $idCol, $toks AS toks FROM $table
    ), u AS (
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
    ), tot AS (
      SELECT cast(sum(cnt) as bigint) AS total FROM u
    ), bi AS (
      SELECT $idCol, toks, unnest(range(1, len(toks))) AS i FROM t
    ), bg AS (
      SELECT $idCol, toks[i] AS prev, toks[i + 1] AS cur FROM bi
    ), cb AS (
      SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2
    ), sc AS (
      SELECT cb.prev, cb.cur,
             cast(floor(ln(
               $lambda * (cast(cb.cb as double) / cast(up.cnt as double))
               + ${1.0 - lambda}
                 * (cast(uc.cnt as double) / cast(tot.total as double)))
               * 1000000.0) as bigint) AS lp_micro
      FROM cb
      JOIN u up ON cb.prev = up.tok
      JOIN u uc ON cb.cur = uc.tok
      CROSS JOIN tot
    )
    SELECT bg.$idCol, cast(count(*) as int) AS n_bigrams,
           cast(sum(sc.lp_micro) as bigint) AS lp_micro_sum,
           cast(sum(sc.lp_micro) as double)
             / cast(cast(count(*) as int) as double) / 1000000.0
             AS avg_logprob
    FROM bg JOIN sc ON bg.prev = sc.prev AND bg.cur = sc.cur
    GROUP BY bg.$idCol"""
  }

  /** Per-document TF-IDF keyword extraction: the top `topK` terms of
    * each document by tf·idf — the corpus-exploration counterpart of
    * [[bm25]] (which ranks DOCS for a query; this ranks TERMS for a
    * doc): tag generation, near-dup triage, topic drill-down.
    *
    * Engine-exact by construction: idf = ln(N/df) is quantized ONCE per
    * term to integer micro-nats, so the score tf·idf_micro is an exact
    * integer and the per-doc ranking (score DESC, term ASC) is a total
    * integer order — no float comparisons anywhere. Shape: one (doc,
    * term) count keyed by the up-front doc repartition (the
    * [[tokenEntropy]] one-exchange layout), df as one bounded
    * vocab-sized aggregate broadcast back, ranking as a per-doc window
    * over the doc's own term types (bounded by doc length).
    */
  def tfidfKeywords(df: DataFrame, topK: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text",
                    broadcastIdf: Boolean = true): DataFrame = {
    // consumed twice (dfreq + the ranking join) → materialized once, or
    // the tokenize+explode+count lineage runs per reference (house
    // policy, the categoricalChange lesson)
    val counts = df.repartition(col(idCol))
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(col("__toks")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .cutLineage()
    val n = df.select(count(lit(1)).as("n_docs"))
    val dfreq = counts.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tok"),
        floor(log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1000000.0)).as("idf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("tok"))
    // broadcastIdf=true assumes the vocab fits one executor (~10^8
    // terms × ~24 B — holds for curated corpora, NOT for raw open-web
    // text whose type count grows with corpus size); it also keeps
    // counts partitioned by idCol so the ranking window adds no
    // exchange. broadcastIdf=false lets the planner shuffle-join on
    // tok — one extra exchange, no memory ceiling.
    val dfreqSide = if (broadcastIdf) broadcast(dfreq) else dfreq
    counts.join(dfreqSide, Seq("tok"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(idCol), col("tok"), col("tf"), col("score_micro"),
        col("rnk"))
  }

  /** DuckDB oracle for [[tfidfKeywords]] — identical tokenization,
    * quantization, and the identical total ranking order.
    */
  def tfidfKeywordsSql(topK: Int = 3, table: String = "documents",
                       idCol: String = "doc_id",
                       textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH toks AS (
      SELECT $idCol, unnest($toks) AS tok FROM $table
    ), counts AS (
      SELECT $idCol, tok, count(*) AS tf FROM toks GROUP BY $idCol, tok
    ), n AS (SELECT cast(count(*) as bigint) AS n_docs FROM $table
    ), dfreq AS (
      SELECT tok, cast(floor(ln(cast((SELECT n_docs FROM n) as double)
               / cast(count(*) as double)) * 1000000.0) as bigint)
               AS idf_micro
      FROM counts GROUP BY tok
    )
    SELECT c.$idCol, c.tok, cast(c.tf as bigint) AS tf,
           cast(c.tf * d.idf_micro as bigint) AS score_micro,
           cast(row_number() OVER (PARTITION BY c.$idCol
             ORDER BY c.tf * d.idf_micro DESC, c.tok) as int) AS rnk
    FROM counts c JOIN dfreq d USING (tok)
    QUALIFY rnk <= $topK"""
  }

  /** Per-document token Shannon entropy — the lexical-diversity quality
    * signal (low entropy = repetitive/templated text, high = diverse
    * vocabulary; complements [[repetition]]'s dup-fraction screens with
    * an information-theoretic one): H = −Σ_types (c/n)·ln(c/n) over the
    * document's own token counts.
    *
    * Cross-engine determinism (the [[unigramLogProb]] recipe): each
    * token TYPE's ln(c/n) is quantized once to integer micro-nats, the
    * per-document reduction is then an order-independent integer sum
    * Σ c·floor(ln(c/n)·1e6), and the published entropy divides by
    * (n·1e6) in one fixed IEEE op order. One explode + one (doc, tok)
    * count + one per-doc sum — two shuffles on bounded keys, nothing
    * wide ever shuffles on raw text.
    */
  def tokenEntropy(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // ONE exchange for the whole pipeline: partitioning the DOCS by id
    // up front satisfies the (id, tok) groupBy (hash(id) ⊆ clustering
    // (id, tok)), the per-doc window, AND the final per-doc aggregate —
    // without it Spark shuffles the exploded (doc, token-type) stream a
    // second time for the window, and docs shuffle as whole rows once
    // instead of token rows twice
    val counts = df.repartition(col(idCol))
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(col("__toks")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val withN = counts.withColumn("n",
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol))))
    withN
      .groupBy(col(idCol))
      .agg(first(col("n")).as("n"),
        count(lit(1)).cast("int").as("n_types"),
        sum(col("c") * floor(log(col("c").cast("double") / col("n").cast("double"))
          * lit(1000000.0))).as("__h_micro"))
      .select(col(idCol), col("n").cast("int").as("n_tokens"), col("n_types"),
        (-col("__h_micro").cast("double") /
          (col("n").cast("double") * lit(1000000.0))).as("entropy"))
  }

  /** DuckDB oracle for [[tokenEntropy]] — identical tokenization,
    * quantization, and reduction order.
    */
  def tokenEntropySql(table: String = "documents",
                      idCol: String = "doc_id",
                      textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH toks AS (
      SELECT $idCol, unnest($toks) AS tok FROM $table
    ), counts AS (
      SELECT $idCol, tok, count(*) AS c FROM toks GROUP BY $idCol, tok
    ), withn AS (
      SELECT $idCol, c,
             sum(c) OVER (PARTITION BY $idCol) AS n
      FROM counts
    )
    SELECT $idCol, cast(any_value(n) as int) AS n_tokens,
           cast(count(*) as int) AS n_types,
           -cast(sum(c * cast(floor(ln(cast(c as double) / cast(n as double))
                 * 1000000.0) as bigint)) as double)
             / (cast(any_value(n) as double) * 1000000.0) AS entropy
    FROM withn GROUP BY $idCol"""
  }

  /** DuckDB oracle for [[unigramLogProb]] — identical tokenization,
    * identical micro-nat quantization, identical division order.
    */
  def unigramLogProbSql(table: String = "documents",
                        idCol: String = "doc_id",
                        textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH toks AS (
      SELECT $idCol, unnest($toks) AS tok FROM $table
    ), freq AS (
      SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), tot AS (
      SELECT cast(sum(cnt) as bigint) AS total FROM freq
    ), scored AS (
      SELECT tok, cast(floor(ln(cast(cnt as double) / cast(total as double))
                             * 1000000.0) as bigint) AS lp_micro
      FROM freq, tot
    )
    SELECT t.$idCol, cast(count(*) as int) AS n_tokens,
           cast(sum(s.lp_micro) as bigint) AS lp_micro_sum,
           cast(sum(s.lp_micro) as double) / cast(cast(count(*) as int) as double)
             / 1000000.0 AS avg_logprob
    FROM toks t JOIN scored s USING (tok)
    GROUP BY t.$idCol"""
  }

  /** End-to-end quality filter cascade (the RefinedWeb/Gopher-style rule
    * screen a corpus passes before training): short documents, repetitive
    * documents, top-token-dominated documents, PII-bearing documents, and
    * language-mismatched documents are dropped, with the FIRST failing
    * rule recorded per document (the standard auditable-filter shape —
    * drop reasons are a dataset, not a log line). All per-doc metrics
    * except the token stats are pure projections chained on one scan;
    * the token stats join back on doc_id — one join, one scan of the
    * corpus plus one unigram aggregation.
    * Thresholds compare the ROUNDED published metrics, so the decision is
    * reproducible from the gated per-metric outputs.
    *
    * The cascade computes ONLY what its rules read: the token-family
    * fractions directly from a unigram explode (identical arithmetic —
    * hence identical rounded values — to the gated [[repetition]]
    * metrics, without the bigram/line families no rule consumes), and
    * the PII rule as boolean `rlike` probes (`n > 0` ⟺ a match exists;
    * no counting, no scrub-hash of documents that are about to be
    * dropped anyway).
    */
  def corpusFilter(df: DataFrame, minWords: Int = 20,
                   maxDupTokenFrac: Double = 0.6,
                   maxTopTokenFrac: Double = 0.12,
                   langCol: String = "lang",
                   digits: Int = 4): DataFrame = {
    // coalesce: tokens(NULL) is NULL and size(NULL) is NULL — a
    // null-text doc must read word_count 0 so the too_short rule flags
    // it instead of every rule SKIPPING (null predicates fall through
    // a when-chain)
    val metrics = langId(df)
      .withColumn("word_count",
        coalesce(size(tokens(col("text"))), lit(0)))
      .withColumn("has_pii",
        col("text").rlike(emailRe) || col("text").rlike(phoneRe))
    val rep = df
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("cnt")).as("top_cnt"))
      .select(col("doc_id"),
        round((col("n_tokens") - col("n_types")) / col("n_tokens"), digits)
          .as("dup_token_frac"),
        round(col("top_cnt") / col("n_tokens"), digits).as("top_token_frac"))
    // LEFT join: a token-less doc (null/empty text) explodes to zero
    // rows in `rep`, and an inner join would silently DROP it from the
    // screen — a quality filter must emit a verdict for EVERY doc. Its
    // null fracs are never consulted: word_count 0 fires too_short
    // first.
    metrics.join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("word_count") < minWords, "too_short")
          .when(col("dup_token_frac") > maxDupTokenFrac, "repetitive")
          .when(col("top_token_frac") > maxTopTokenFrac, "top_token")
          .when(col("has_pii"), "pii")
          .when(col("pred_lang") =!= col(langCol), "lang_mismatch")
          .otherwise("keep").as("reason"))
      .withColumn("keep", when(col("reason") === "keep", 1).otherwise(0))
  }

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

  /** Corpus heavy hitters — every token whose frequency exceeds
    * `perMille`/1000 of all tokens, with its EXACT count. The
    * vocabulary-statistics primitive of corpus analysis (stopword
    * discovery, boilerplate detection, tokenizer-vocab seeding) in the
    * shape that survives a vocabulary larger than memory:
    *
    * propose → exact-verify, like the dedup family. Pass 1 runs ONE
    * fixed-memory Misra–Gries sketch ([[graft.functions.MisraGriesAgg]],
    * k counters, map-side partials + one k-bounded merge — no
    * full-vocab shuffle, no full-vocab state anywhere) whose guarantee
    * makes the k keys a SUPERSET of every token above n/(k+1). Pass 2
    * re-scans, keeps only candidate tokens (broadcast semi-join against
    * the ≤ k candidates), counts them exactly — the shuffle carries at
    * most k keys × partitions rows — and keeps counts over the
    * threshold. The sketch's approximate counts never surface: output
    * is exact, so the DuckDB oracle is a plain GROUP BY ... HAVING.
    * Threshold test is the integer cross-product cnt·1000 > n·perMille
    * (no division, engine-exact). Requires sketchK + 1 ≥ 1000/perMille
    * (the MG guarantee must cover the threshold).
    *
    * A naive one-pass `groupBy(tok).count.filter` is simpler and fine
    * while the vocab fits the shuffle — this operator exists for the
    * open-web regime where it does not; at 100 TB the two scans are the
    * price of a bounded shuffle, and scan 2 prunes to `textCol` only.
    */
  def heavyHitters(df: DataFrame, perMille: Int = 1, sketchK: Int = 2000,
                   textCol: String = "text"): DataFrame = {
    require(perMille >= 1 && perMille <= 1000, "heavyHitters: perMille in [1,1000]")
    require((sketchK + 1).toLong * perMille >= 1000L,
      s"heavyHitters: sketchK=$sketchK too small for perMille=$perMille " +
        "(need sketchK+1 >= 1000/perMille for the Misra-Gries guarantee)")
    val spark = df.sparkSession
    val toks = df.select(explode(tokens(col(textCol))).as("tok"))
    if (!spark.catalog.functionExists("misra_gries")) {
      // builtin fallback (house contract: every operator runs without
      // the extension): the naive full-vocab groupBy — correct, and
      // fine while the vocabulary fits the shuffle; the sketch path is
      // the open-web-scale shape
      val counted = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .cutLineage()
      val total = counted.agg(sum(col("cnt")).as("n"))
      return counted.crossJoin(broadcast(total))
        .filter(col("cnt") * 1000 > col("n") * perMille)
        .select(col("tok"), col("cnt"))
    }
    // pass 1: sketch + total token count in the SAME single-pass agg
    val sketch = toks.agg(
      expr(s"misra_gries(tok, $sketchK)").as("mg"),
      count(lit(1)).as("n")).cutLineage()
    val candidates = sketch.select(explode(map_keys(col("mg"))).as("tok"))
    val total = sketch.select(col("n"))
    // pass 2: exact counts for candidates only; broadcast both bounded frames
    toks.join(broadcast(candidates), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 1000 > col("n") * perMille)
      .select(col("tok"), col("cnt"))
  }

  /** DuckDB oracle for [[heavyHitters]] — the exact definition the
    * propose/verify composition must land on.
    */
  def heavyHittersSql(perMille: Int = 1, table: String = "documents",
                      textCol: String = "text"): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '$wsRe')"
    s"""WITH toks AS (SELECT unnest($toks) AS tok FROM $table),
       n AS (SELECT cast(count(*) as bigint) AS total FROM toks),
       c AS (SELECT tok, cast(count(*) as bigint) AS cnt
             FROM toks GROUP BY tok)
     SELECT tok, cnt FROM c
     WHERE cnt * 1000 > (SELECT total FROM n) * $perMille"""
  }
}
