package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinHashSpec, SimHash}
import graft.text.Text

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("quality scores a known string exactly") {
    val df = Seq((1L, "the quick fox!")).toDF("doc_id", "text")
    val r = Text.quality(df).collect().head
    assert(r.getAs[Int]("n_chars_calc") == 14)
    assert(r.getAs[Int]("word_count") == 3)
    assert(r.getAs[Int]("punct_count") == 1)   // '!'
    assert(r.getAs[Int]("stop_count") == 1)    // 'the'
  }

  test("tokenCounts: whitespace vs BPE-ish segmentation") {
    val df = Seq((1L, "ab12 cd, e")).toDF("doc_id", "text")
    val r = Text.tokenCounts(df).collect().head
    assert(r.getAs[Int]("ws_tokens") == 3)
    // [ab][12][cd][,][e]
    assert(r.getAs[Int]("bpe_tokens") == 5)
  }

  test("chunk: overlap reconstruction, short-doc identity, empty-doc convention") {
    import spark.implicits._
    val longText = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, longText),              // 100 tokens -> 4 chunks at 32/8
      (2L, "just a short doc"),    // <= size -> single chunk
      (3L, "")                     // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val out = graft.text.Text.chunk(docs, chunkSize = 32, overlap = 8)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.sortBy(_.getAs[Int]("chunk_idx")) }

    val long = out(1L)
    // 1 + ceil((100-32)/24) = 4 chunks, starts at multiples of the stride
    assert(long.length == 4)
    assert(long.map(_.getAs[Int]("start_tok")).toSeq == Seq(0, 24, 48, 72))
    assert(long.map(_.getAs[Int]("n_toks")).toSeq == Seq(32, 32, 32, 28))
    // dropping each later chunk's leading overlap reconstructs the doc
    val chunksToks = long.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    val rebuilt = chunksToks.head ++ chunksToks.tail.flatMap(_.drop(8))
    assert(rebuilt == longText.split(" ").toSeq)
    // consecutive chunks agree on the shared overlap window
    chunksToks.sliding(2).foreach { w =>
      assert(w(0).takeRight(8) == w(1).take(8))
    }

    val short = out(2L)
    assert(short.length == 1 && short.head.getAs[Int]("n_toks") == 4)
    assert(short.head.getAs[String]("chunk_text") == "just a short doc")

    // the bm25 one-empty-token convention: one chunk, empty text
    val empty = out(3L)
    assert(empty.length == 1 && empty.head.getAs[Int]("n_toks") == 1)
    assert(empty.head.getAs[String]("chunk_text") == "")
  }

  test("bigramLogProb: hand-computed interpolated scores, word-salad discrimination") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a a b b"), (3L, "a")).toDF("doc_id", "text")
    val out = graft.text.Text.bigramLogProb(docs, lambda = 0.8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bigrams"), r.getAs[Long]("lp_micro_sum"))).toMap
    // uni: a=5, b=4, T=9. cb: (a,b)=3 cp=5; (b,a)=1 cp=4; (a,a)=1 cp=5;
    // (b,b)=1 cp=4 — replicated with the engines' exact double sequence
    val mu = 1.0 - 0.8
    def lp(cb: Long, cp: Long, cc: Long): Long =
      math.floor(math.log(0.8 * (cb.toDouble / cp.toDouble)
        + mu * (cc.toDouble / 9.0)) * 1000000.0).toLong
    assert(out(1L) == ((3, 2 * lp(3, 5, 4) + lp(1, 4, 5))))
    assert(out(2L) == ((3, lp(1, 5, 5) + lp(3, 5, 4) + lp(1, 4, 4))))
    assert(!out.contains(3L)) // no bigrams -> absent, never a 0/0 row
    // word salad: same unigram profile, improbable transitions score lower
    val corpus = ((1L to 8L).map(i => (i, "c d c d c d c d")) :+
      (9L, "d c d d c c c d")).toDF("doc_id", "text")
    val avg = graft.text.Text.bigramLogProb(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(avg(9L) < avg(1L))
  }

  test("langId picks the language with most marker hits, tie → first") {
    val df = Seq((1L, "der und ist fine"), (2L, "xyz qqq")).toDF("doc_id", "text")
    val out = Text.langId(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) == "de")
    assert(out(2L) == "und") // no hits at all
  }

  test("contamination flags docs sharing an n-gram with the benchmark") {
    // benchmark doc of 10 tokens; doc 2 embeds an 8-token span of it
    // (→ contaminated), doc 3 shares only 7 consecutive tokens (→ not,
    // at n=8), doc 4 is unrelated. The benchmark doc itself is in the
    // corpus, as in a real decontamination pass, and self-matches on
    // all 3 of its distinct 8-gram shingles.
    val bench = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      (1L, bench),
      (2L, s"x y t2 t3 t4 t5 t6 t7 t8 t9 z"),
      (3L, s"x y t2 t3 t4 t5 t6 t7 t8 q z"),
      (4L, "u v w a b c d e f g h i")).toDF("doc_id", "text")
    val out = Text.contamination(docs, docs.filter(col("doc_id") === 1L))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((3, 1)))
    assert(out(2L) == ((1, 1)))
    assert(out(3L) == ((0, 0)))
    assert(out(4L) == ((0, 0)))
  }

  test("fingerprint: identical docs share fingerprints, different don't") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "z y x w v u t s")).toDF("doc_id", "text")
    val out = Text.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("min_fingerprint")).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("normalize collapses case/punctuation/whitespace variants") {
    val df = Seq("Hello,  World!", "hello world", "HELLO\tWORLD.",
      "hello\u000Bworld") // vertical tab: explicit ws class, not \s
      .toDF("t")
    val norms = df.select(Text.normalize(col("t"))).collect().map(_.getString(0))
    assert(norms.toSet == Set("hello world"))
  }

  test("exactNormalized clusters variants that md5-exact dedup misses") {
    val df = Seq(
      (1L, "The quick brown fox."),
      (2L, "the  QUICK brown fox"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val exact = Dedup.exact(df).filter(col("is_duplicate") === 1).count()
    assert(exact == 0) // raw bytes differ — exact finds nothing
    val out = Dedup.exactNormalized(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_id")).toMap
    assert(out(1L) == 1L && out(2L) == 1L) // variants share class, min id kept
    assert(out(3L) == 3L)
  }

  test("piiScrub counts and redacts emails, urls, and phone runs") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@example.org or see https://ex.com/a?b=1 now"),
      (2L, "call +1 206-555-0100 twice"),
      (3L, "clean text only")).toDF("doc_id", "text")
    val out = Text.piiScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_urls"),
          r.getAs[Int]("n_phones"))).toMap
    assert(out(1L) == ((1, 1, 0)))
    assert(out(2L) == ((0, 0, 1)))
    assert(out(3L) == ((0, 0, 0)))
    // redaction really replaces the match text
    val scrub2 = Text.piiScrub(df).filter(col("doc_id") === 2L)
      .select(regexp_replace(
        regexp_replace(regexp_replace(col("text"), Text.urlRe, "[URL]"),
          Text.emailRe, "[EMAIL]"), Text.phoneRe, "[PHONE]"))
      .collect().head.getString(0)
    assert(scrub2 == "call [PHONE] twice")
  }

  test("cleanCorpus drops exact-normalized and verified near-dups, keeps min ids") {
    val docs = Tables(spark, sfDir, "documents")
    val kept = Dedup.cleanCorpus(docs, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all) && kept.size < all.size) // something was dropped
    // every exact-normalized duplicate is gone, every keeper survives...
    val exact = Dedup.exactNormalized(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_duplicate"))
    exact.foreach { case (id, dup) =>
      if (dup == 1) assert(!kept.contains(id))
    }
    // ...and no verified near-dup pair survives intact
    val pairs = Dedup.jaccardOnCandidates(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    pairs.foreach { case (_, b) => assert(!kept.contains(b)) }
  }

  test("graft.checkpoint=reliable: cleanCorpus value-equal to local mode") {
    // the §5 size-class-(b) swap as a session KNOB (VERDICT r11 item
    // 3): reliable checkpoint() instead of localCheckpoint() at every
    // Dedup/Text cut site. Value-neutral by construction — pinned here
    // end to end on the operator with the most cut sites in its plan
    // (exact stage + candidate pairs + verify).
    val docs = Tables(spark, sfDir, "documents")
    val viaLocal = Dedup.cleanCorpus(docs, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    val ckptDir = tempDir("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.conf.set(graft.config.Checkpoints.KEY, "reliable")
    try {
      val viaReliable = Dedup.cleanCorpus(docs, threshold = 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(viaReliable == viaLocal)
      // the mode really wrote reliable checkpoints (not a silent
      // fall-through to executor-local blocks)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable mode should write to the checkpoint dir")
    } finally spark.conf.set(graft.config.Checkpoints.KEY, "local")
    // and a bogus value fails loudly, not silently-local
    spark.conf.set(graft.config.Checkpoints.KEY, "bogus")
    try {
      intercept[IllegalArgumentException] {
        graft.config.Checkpoints.cut(docs.limit(1).toDF()): Unit
      }: Unit
    } finally spark.conf.set(graft.config.Checkpoints.KEY, "local")
  }

  test("keepBest keeps the highest-quality cluster member, not the min id") {
    import spark.implicits._
    // docs 1/2/3 are near-identical (one differing trailing token, so
    // Jaccard stays high); docs 1 and 2 carry punctuation-noise tokens
    // that depress their quality score, doc 3 is clean — the best-
    // quality member is NOT the min id, so keepBest must beat
    // cleanCorpus's keep-min-id rule.
    val core = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, s"$core #!!?%"),
      (2L, s"$core &*@!)"),
      (3L, s"$core okays"),
      (10L, "a completely different singleton document about spark plans")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.keepBest(docs, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("keep_doc_id"), r.getAs[Int]("n_docs"))).toMap
    assert(out.contains(1L), s"expected cluster labeled 1, got ${out.keys}")
    val (keep, n) = out(1L)
    assert(n == 3)
    assert(keep == 3L) // highest quality_score wins, not min id
    assert(out(10L) == ((10L, 1))) // singleton keeps itself
    // survivor's score equals the max member score
    val q = graft.text.Text.quality(docs).select("doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(3L) > q(1L) && q(3L) > q(2L),
      s"test premise: doc 3 must score highest, got $q")
  }

  test("spanDedup drops repeated full spans, keeps first occurrence and tails") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")  // span A (10 tokens)
    val b = (1 to 10).map(i => s"b$i").mkString(" ")  // span B
    val w = (1 to 10).map(i => s"w$i").mkString(" ")  // unique to doc 2
    val tail = "p1 p2 p3 p4 p5"                       // 5-token partial
    val docs = Seq(
      (1L, s"$a $b $tail"), // first occurrence of A and B
      (2L, s"$a $w"),       // A repeated → dropped; W survives
      (3L, s"$a $b")        // both repeated, no tail → emptied
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((3L, 3L, s"$a $b $tail")))
    assert(out(2L) == ((2L, 1L, w)))
    assert(out(3L) == ((2L, 0L, "")))
    // a partial tail never dedups against a full span's prefix
    val edge = Seq((1L, a), (2L, (1 to 5).map(i => s"a$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept2 = Dedup.spanDedup(edge).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    assert(kept2 == Map(1L -> 1L, 2L -> 1L))
  }

  test("exact dedup finds planted duplicates and keeps the min id") {
    val df = Seq((10L, "same text"), (20L, "same text"), (30L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keep_id"), r.getAs[Int]("is_duplicate"))).toMap
    assert(out(10L) == ((10L, 0)) && out(20L) == ((10L, 1)) && out(30L) == ((30L, 0)))
  }

  test("exact-family NULL-text contract: null docs are singletons, never lost") {
    val df = Seq((1L, Some("same")), (2L, Some("same")),
      (3L, None), (4L, None)).toDF("doc_id", "text")
    // exact: all 4 docs present; the two null-text docs keep themselves
    val out = Dedup.exact(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Int]("is_duplicate"),
          r.getAs[String]("text_hash")))).toMap
    assert(out.size == 4)
    assert(out(2L)._1 == 1L && out(2L)._2 == 1)
    assert(out(3L) == ((3L, 0, null)) && out(4L) == ((4L, 0, null)))
    // exactNormalized inherits the contract through its delegation
    val norm = Dedup.exactNormalized(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_duplicate")).toMap
    assert(norm.size == 4 && norm(3L) == 0 && norm(4L) == 0)
    // histogram form: 2 null singletons + 1 pair, never one null mega-cluster
    val hist = Dedup.clusterSizeStats(df).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    assert(hist == Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L))))
  }

  test("NULL-text contract at the shingle layer: degenerate docs have no " +
    "shingles, so the near-dup stack never merges them") {
    // null / empty / whitespace docs all tokenize to [""]; without the
    // shingle filter they'd share the {""} shingle set (jaccard 1.0
    // with each other) and the near stack would "deduplicate" missing
    // payloads. Contract: no real tokens → no shingles → invisible to
    // propose AND verify; cleanCorpus keeps every degenerate doc.
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "alpha beta gamma delta epsilon zeta"),
      (5L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val cand = MinHashSpec.candidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSeq == Seq((4L, 5L)))
    val jac = Dedup.ngramJaccard(docs, threshold = 0.0).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(jac.toSeq == Seq((4L, 5L)))
    val kept = Dedup.cleanCorpus(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // 5 drops (exact dup of 4). 3 drops too: "" and "   " both NORMALIZE
    // to the empty string, and empty is CONTENT (two known-empty docs are
    // identical), unlike null (missing payload, never a duplicate) — the
    // null/empty boundary of the contract, exercised in one corpus.
    assert(kept == Set(1L, 2L, 4L))
  }

  test("spanDedup/boilerplate NULL-text convention: doc survives as empty") {
    val docs = Seq((1L, "a b c d e f g h i j a b c d e f g h i j"),
      (2L, null.asInstanceOf[String]), (3L, "")).toDF("doc_id", "text")
    for (out <- Seq(Dedup.spanDedup(docs), Dedup.boilerplateDedup(docs))) {
      val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[String]("clean_text")))).toMap
      assert(byId.keySet == Set(1L, 2L, 3L)) // nobody silently dropped
      // null behaves exactly like empty: one partial span, kept
      assert(byId(2L) == ((1L, "")) && byId(3L) == ((1L, "")))
    }
  }

  test("LSH mega-cluster guard: maxBucket caps the quadratic bucket; " +
    "cleanCorpus collapses it before banding") {
    // the crawl reality: one boilerplate page lands m times; every copy
    // shares every band bucket, so the uncapped self-join pays C(m,2)
    val boiler = (0L until 60L).map(i =>
      (i, "the same boilerplate page body repeated verbatim across the crawl"))
    val pairDup = Seq(
      (102L, "alpha beta gamma delta epsilon zeta eta theta"),
      (103L, "alpha beta gamma delta epsilon zeta eta theta"))
    val rest = (200L until 205L).map(i =>
      (i, s"unique document number $i with its own content w$i x$i y$i z$i"))
    val docs = (boiler ++ pairDup ++ rest).toDF("doc_id", "text")
    // uncapped: the cluster alone contributes C(60,2) = 1770 pairs
    val uncapped = MinHashSpec.candidatePairs(docs).count()
    assert(uncapped >= 1770L)
    // capped: the mega bucket is dropped entirely; the size-2 bucket
    // (the honest duplicate pair) still proposes
    val capped = MinHashSpec.candidatePairs(docs, maxBucket = 10)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!capped.exists(p => p._1 < 60L && p._2 < 60L))
    assert(capped.contains((102L, 103L)))
    // the cascade means cleanCorpus never NEEDS the cap for identical
    // docs: the exact stage collapses the cluster to doc 0 before the
    // propose stage bands anything
    val out = Dedup.cleanCorpus(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(out.intersect((0L until 60L).toSet) == Set(0L))
    assert(out.contains(102L) && !out.contains(103L))
    assert((200L until 205L).forall(out.contains))
  }

  test("ngramJaccard finds the planted near-dup pairs on real data") {
    val pairs = Dedup.ngramJaccard(Tables(spark, sfDir, "documents"),
      threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
    // near-dup pairs at 0.95+ exist in the synthetic corpus
    assert(pairs.exists(_.getAs[Double]("jaccard") > 0.9))
  }

  test("minhash LSH candidates contain every true high-jaccard pair") {
    val docs = Tables(spark, sfDir, "documents")
    val trueDups = Dedup.ngramJaccard(docs, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val cands = MinHashSpec.candidatePairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(trueDups.nonEmpty)
    assert(trueDups.subsetOf(cands),
      s"missed: ${trueDups.diff(cands)}")
    // and the estimate on those pairs is high
    val est = MinHashSpec.candidatePairs(docs).collect()
      .filter(r => trueDups.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    est.foreach(r => assert(r.getAs[Double]("est_jaccard") >= 0.5))
  }

  test("LSH-candidate jaccard finds the same near-dups as all-pairs") {
    val docs = Tables(spark, sfDir, "documents")
    val allPairs = Dedup.ngramJaccard(docs, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val viaLsh = Dedup.jaccardOnCandidates(docs, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    // all-pairs blocks on lang (misses cross-lang dups); the LSH path has
    // no block, so it finds a superset of the blocked pairs.
    assert(allPairs.nonEmpty && allPairs.subsetOf(viaLsh))
    assert(viaLsh.size >= allPairs.size)
  }

  test("connectedComponents labels chains transitively with the component min") {
    // chain 1-2-3 (no direct 1-3 pair), clique 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges in O(log diameter) rounds on a long chain") {
    // a 64-node path: pure neighbor propagation needs 63 rounds; with
    // pointer jumping the label reaches the far end in ~log2(64) rounds
    val n = 64
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, maxRounds = 10).collect()
    assert(cc.length == n.toInt)
    assert(cc.forall(_.getAs[Long]("cluster") == 0L))
  }

  test("containment flags the contained small doc Jaccard misses; df cap drops stop-shingles") {
    import spark.implicits._
    val big = ((1 to 40).map(i => s"w$i")).mkString(" ")      // 38 shingles
    val small = ((1 to 6).map(i => s"w$i")).mkString(" ")     // 4 shingles, all in big
    val other = ((100 to 120).map(i => s"v$i")).mkString(" ")
    val df = Seq((1L, big, "en"), (2L, small, "en"), (3L, other, "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.dedup.Dedup.containment(df, threshold = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the same pair is invisible to Jaccard at any usable threshold:
    // 4 common shingles of 38 ∪ 4 → J ≈ 0.105
    val j = graft.dedup.Dedup.ngramJaccard(df, threshold = 0.5).collect()
    assert(!j.exists(p => p.getLong(0) == 1L && p.getLong(1) == 2L))
    // df cap = 1 drops every shingle shared by 2+ docs → no pairs at all
    assert(graft.dedup.Dedup.containment(df, threshold = 0.1, maxDf = 1)
      .collect().isEmpty)
  }

  test("collocations: bound pair outranks frequent-independent, minCount floors hapax") {
    import spark.implicits._
    // 'new york' always co-occurs (6 times, passes minCount=5); 'the'
    // pairs freely with cat/dog/sun (frequent but independent); 'rare
    // gem' occurs 4 times — below the floor, must not appear
    val doc = (Seq.fill(6)("new york") ++
      Seq.fill(8)("the cat") ++ Seq.fill(8)("the dog") ++
      Seq.fill(8)("the sun") ++ Seq.fill(4)("rare gem")).mkString(" x ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val out = graft.text.Text.collocations(df, topK = 10, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
    val pmi = out.toMap
    assert(pmi.contains(("new", "york")))
    assert(!pmi.keySet.exists(p => p == ("rare", "gem"))) // floored
    // the bound pair scores strictly above every 'the *' pair present
    val theScores = out.filter(_._1._1 == "the").map(_._2)
    theScores.foreach(s => assert(pmi(("new", "york")) > s))
    // ranking is by descending score
    val scores = graft.text.Text.collocations(df, topK = 10, minCount = 5)
      .collect().map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("tfidfKeywords surfaces the doc-distinctive term, ties break on term") {
    import spark.implicits._
    // 'rare' appears only in doc 1 (idf = ln 3); 'common' in all docs
    // (idf = 0) — the distinctive term must outrank the frequent one
    val df = Seq(
      (1L, "common common common rare"),
      (2L, "common other other"),
      (3L, "common misc")).toDF("doc_id", "text")
    val out = graft.text.Text.tfidfKeywords(df, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    assert(out((1L, 1)) == "rare")     // 1·ln3 beats 3·0
    assert(out((2L, 1)) == "other")    // 2·ln(3/2)
    // doc 3: both terms score... common: 1·0 = 0; misc: 1·ln3 > 0
    assert(out((3L, 1)) == "misc")
    // zero-score ties rank alphabetically (total integer order)
    val d1 = graft.text.Text.tfidfKeywords(
      Seq((9L, "b a")).toDF("doc_id", "text"), topK = 2).collect()
      .sortBy(_.getInt(4)).map(_.getString(1)).toSeq
    assert(d1 == Seq("a", "b"))
  }

  test("tokenEntropy: uniform ln(k), constant 0, mixed hand-computed") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),          // constant → H = 0
      (2L, "a b c d"),          // uniform over 4 → H = ln 4
      (3L, "a a b b b c"))      // H = −(2/6·ln(2/6) + 3/6·ln(3/6) + 1/6·ln(1/6))
      .toDF("doc_id", "text")
    val out = graft.text.Text.tokenEntropy(df).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Double]("entropy"))).toMap
    assert(out(1L)._1 == 4 && out(1L)._2 == 1)
    assert(out(1L)._3 == 0.0)
    assert(math.abs(out(2L)._3 - math.log(4)) < 1e-4)
    val h3 = -(2.0 / 6 * math.log(2.0 / 6) + 3.0 / 6 * math.log(3.0 / 6) +
      1.0 / 6 * math.log(1.0 / 6))
    assert(out(3L)._1 == 6 && out(3L)._2 == 3)
    assert(math.abs(out(3L)._3 - h3) < 1e-4)
  }

  test("repetition: dup/top fractions from a constructed doc") {
    // tokens: a a a b  (4 tokens, 2 types, top token 'a' x3)
    // bigrams: "a a","a a","a b" (3 bigrams, top "a a" x2)
    val df = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = Text.repetition(df).collect().head
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_types") == 2)
    assert(r.getAs[Double]("dup_token_frac") == 0.5)
    assert(r.getAs[Double]("top_token_frac") == 0.75)
    assert(r.getAs[Double]("top_bigram_frac") == 0.6667)
    assert(r.getAs[Int]("n_lines") == 1)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
  }

  test("bm25: exact-match doc outranks partial; score favors rarer term") {
    val df = Seq(
      (1L, "spark merge spark merge"),   // both terms, high tf
      (2L, "spark table scan row"),      // one common term
      (3L, "merge batch"),               // one rarer term occurrence
      (4L, "key value store"))           // no match
      .toDF("doc_id", "text")
    val out = Text.bm25(df, Seq("spark", "merge"), topK = 10).collect()
    val byDoc = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(!byDoc.contains(4L))                 // no-match doc absent
    assert(byDoc(1L) > byDoc(2L) && byDoc(1L) > byDoc(3L))
    assert(out.head.getAs[Long]("doc_id") == 1L) // ranked first
    val hits = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("n_terms_hit")).toMap
    assert(hits(1L) == 2 && hits(2L) == 1 && hits(3L) == 1)
  }

  test("corpusFilter verdicts every doc: null/empty text is too_short, not dropped") {
    val df = Seq(
      (1L, null.asInstanceOf[String], "en"),
      (2L, "", "en"),
      (3L, "the a and is of to " * 5 + (1 to 18).map(i => s"x$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val out = Text.corpusFilter(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("reason"), r.getAs[Int]("keep")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // the screen drops nobody
    assert(out(1L) == (("too_short", 0)) && out(2L) == (("too_short", 0)))
    assert(out(3L)._2 == 1)
  }

  test("corpusFilter records the first failing rule and keeps clean docs") {
    val longClean = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct en-ish words? no markers
    val df = Seq(
      (1L, "too short", "en"),
      (2L, ("dup " * 30).trim, "en"),                        // repetitive
      (3L, "the a and is of to " * 5 + (1 to 18).map(i => s"x$i").mkString(" "), "en"),
      (4L, longClean + " the a and is of to the a and is", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Text.corpusFilter(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("reason"), r.getAs[Int]("keep"))).toMap
    assert(out(1L) == (("too_short", 0)))
    assert(out(2L) == (("repetitive", 0)))
    assert(out(1L)._2 == 0 && out(2L)._2 == 0)
    // docs 3 and 4: long enough, diverse enough, en markers → kept
    assert(out(3L) == (("keep", 1)))
    assert(out(4L) == (("keep", 1)))
  }

  test("connectedComponents: empty pair list yields empty labeling") {
    // Regression: the one-job-per-round convergence aggregate is a
    // sum(), which is NULL over an empty frame — a corpus with no
    // near-dup pairs must yield an empty labeling, not an NPE.
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("repetition & corpusFilter keep their fused scan counts") {
    // The r5 fusions are plan-shape guarantees, not just perf numbers:
    // repetition reads the corpus ONCE (tagged unigram+bigram explode),
    // corpusFilter TWICE (metrics projection chain + unigram agg). A
    // regression to per-family scans would triple the 100 TB read cost.
    def scans(df: org.apache.spark.sql.DataFrame): Int = {
      // execute THIS QueryExecution so the counted plan is the finalized
      // adaptive plan that ran, not the pre-execution draft
      df.queryExecution.toRdd.count(): Unit
      // finalized adaptive plans print final + initial sections; count
      // scans in the FINAL one only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      "Scan parquet".r.findAllIn(plan).length
    }
    val docs = Tables(spark, sfDir, "documents")
    assert(scans(Text.repetition(docs)) == 1)
    assert(scans(Text.corpusFilter(docs)) == 2)
  }

  test("shingle self-joins hang both sides off ONE reused exchange") {
    // The r12 §8h shape: ngramJaccard/containment shuffle the exploded
    // shingle table exactly ONCE — a single repartition(blk, w) exchange
    // that AQE ReuseExchange shares across both self-join sides (and the
    // semi-join probe) — because at 100 TB that table is the operator's
    // biggest intermediate. Auto-broadcast off so the tiny test corpus
    // plans the at-scale join shape; measured at sf1: ngram 38.3→8.0 s,
    // containment 56.4→23.7 s when this replaced the localCheckpoint
    // (whose LogicalRDD reports UnknownPartitioning under AQE, forcing
    // every consumer to re-shuffle).
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.queryExecution.toRdd.count(): Unit
        df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      }
      val docs = Tables(spark, sfDir, "documents")
      // expected count of NON-reused shingle-keyed exchanges:
      // ngramJaccard 1 (the exploded table, both join sides reuse it);
      // containment 2 (the exploded table — the optimizer collapses the
      // explicit repartition into the semi-join's ENSURE_REQUIREMENTS
      // exchange — plus the vocab-sized df-cap partial aggregate, with
      // BOTH reused on the second self-join side)
      for ((op, want) <- Seq(Dedup.ngramJaccard(docs) -> 1,
                             Dedup.containment(docs) -> 2)) {
        val plan = finalPlan(op)
        // a ReusedExchange line textually embeds the description of the
        // exchange it reuses — count only lines that ARE the exchange
        val shingleShuffles = plan.linesIterator
          .filterNot(_.contains("ReusedExchange"))
          .count(l => l.contains("Exchange hashpartitioning(") &&
            l.contains(" w#"))
        assert(shingleShuffles == want,
          s"expected $want shingle-keyed exchanges, got $shingleShuffles:\n$plan")
        assert(plan.contains("ReusedExchange"),
          s"self-join sides must reuse the shingle exchange:\n$plan")
      }
    } finally spark.conf.set(key, saved)
  }

  test("bucketed index: screens scan the index in place (no index-side " +
    "exchange), and flags equal the raw-index path exactly") {
    // auto-broadcast off so the tiny spec corpus plans the at-scale
    // shape (at 100 TB neither the hash set nor the band table of a
    // corpus-sized index broadcasts)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.queryExecution.toRdd.count(): Unit
        df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      }
      def exchanges(plan: String): Int = plan.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .count(_.contains("Exchange hashpartitioning("))
      val split = graft.etl.Sampling.hashSplit(
        Tables(spark, sfDir, "documents"), "doc_id",
        Seq("corpus" -> 0.8, "incoming" -> 0.2))
      val corpus = split.filter(col("split") === "corpus").drop("split")
        .select(col("doc_id"), col("text"))
      val incoming = split.filter(col("split") === "incoming").drop("split")
        .select(col("doc_id"), col("text"))
      val dir = tempDir("graft-bidx")
      Dedup.saveIndexBucketed(spark, Dedup.buildIndex(corpus), dir,
        tablePrefix = "spec_bidx")
      // the re-attach contract: a NEW session has no catalog entries —
      // loadIndexBucketed must recreate the external bucketed tables
      // over the files, not assume the writer's registrations
      spark.sql("DROP TABLE IF EXISTS spec_bidx_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_bidx_bands")
      val idx = Dedup.loadIndexBucketed(spark, dir, tablePrefix = "spec_bidx")
      // the two per-batch screen joins: the bucketed scan reports its
      // hash partitioning, so ONLY the incoming side shuffles (1
      // exchange); the derived (unbucketed) index pays one per side
      val incHash = incoming.select(md5(col("text")).as("content_hash"))
      val pHash = finalPlan(
        incHash.join(idx.hashes, Seq("content_hash"), "left_semi"))
      assert(pHash.contains("Bucketed: true"), s"hash screen:\n$pHash")
      assert(exchanges(pHash) == 1, s"hash screen:\n$pHash")
      val incBands = MinHashSpec.bandedSignatures(incoming, "doc_id", "text")
      val pBand = finalPlan(incBands.as("x")
        .join(idx.bands.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig"))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b")))
      assert(pBand.contains("Bucketed: true"), s"band screen:\n$pBand")
      assert(exchanges(pBand) == 1, s"band screen:\n$pBand")
      // layout may only change the plan, never the answer
      def flags(i: graft.dedup.DedupIndex) =
        Dedup.incrementalFromIndex(corpus, i, incoming).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
          .toSet
      assert(flags(idx) == flags(Dedup.buildIndex(corpus)))
    } finally {
      spark.conf.set(key, saved)
      spark.sql("DROP TABLE IF EXISTS spec_bidx_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_bidx_bands")
    }
  }

  test("loadIndexBucketed re-attaches on location/bucket mismatch instead " +
    "of returning the stale catalog entry") {
    // ADVICE r13: the bare tableExists short-circuit made two indexes
    // loaded in one session under the same prefix silently read the
    // FIRST dir's data for the second. Plant two disjoint corpora in
    // two dirs, load both with the default-style shared prefix, and
    // assert each load answers from ITS dir.
    import spark.implicits._
    val dirA = tempDir("graft-bidx-a")
    val dirB = tempDir("graft-bidx-b")
    val corpusA = Seq((1L, "alpha one"), (2L, "alpha two"))
      .toDF("doc_id", "text")
    val corpusB = Seq((10L, "beta one"), (11L, "beta two"),
      (12L, "beta three")).toDF("doc_id", "text")
    try {
      Dedup.saveIndexBucketed(spark, Dedup.buildIndex(corpusA), dirA,
        tablePrefix = "spec_bidx2")
      Dedup.saveIndexBucketed(spark, Dedup.buildIndex(corpusB), dirB,
        tablePrefix = "spec_bidx2")
      // save registered dirB last; loading dirA must detect the location
      // mismatch and re-attach rather than serve dirB's rows
      val a = Dedup.loadIndexBucketed(spark, dirA, tablePrefix = "spec_bidx2")
      assert(a.hashes.count() == 2L, "dirA load must see corpusA's 2 hashes")
      val b = Dedup.loadIndexBucketed(spark, dirB, tablePrefix = "spec_bidx2")
      assert(b.hashes.count() == 3L, "dirB load must see corpusB's 3 hashes")
      // nBuckets mismatch on the SAME dir must also re-attach (the
      // restated bucket spec drives the zero-exchange screen plan)
      val a4 = Dedup.loadIndexBucketed(spark, dirA, nBuckets = 8,
        tablePrefix = "spec_bidx2")
      assert(a4.hashes.count() == 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_bidx2_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_bidx2_bands")
    }
  }

  test("cache hygiene: multi-consumer operators leave no CacheManager entry") {
    // The operators that materialize an intermediate for multiple
    // consumers (fused QA stats, LSH signatures/candidates) must do it
    // via localCheckpoint, NOT persist/cache: a long-lived session
    // would otherwise accumulate cached frames until clearCache. The
    // shingle self-joins no longer materialize at all — they reuse one
    // exchange (see the "reuse the shingle exchange" plan spec above) —
    // but stay in the sweep so a reintroduced cache would be caught.
    // Assert none of them registers anything.
    spark.catalog.clearCache()
    val docs = Tables(spark, sfDir, "documents")
    Dedup.ngramJaccard(docs).write.format("noop").mode("overwrite").save()
    Dedup.jaccardOnCandidates(docs).write.format("noop").mode("overwrite").save()
    Dedup.connectedComponents(MinHashSpec.candidatePairs(docs))
      .write.format("noop").mode("overwrite").save()
    import spark.implicits._
    val qaDf = Seq((2020, 1.0, "a", java.sql.Date.valueOf("2020-01-01")),
        (2021, 2.0, "b", java.sql.Date.valueOf("2021-01-01")))
      .toDF("period", "num", "cat", "when")
    graft.qa.Qa.runPipeline(qaDf, "period", Seq("num", "cat", "when"))
      .foreach { case (_, frame) =>
        frame.write.format("noop").mode("overwrite").save() }
    assert(spark.sharedState.cacheManager.isEmpty,
      "an operator left a frame registered in the CacheManager")
  }

  test("simhash: identical docs get identical fingerprints; bands split bits") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "q r s t u"))
      .toDF("doc_id", "text")
    val out = SimHash.fingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(out(1L) == out(2L) && out(1L) != out(3L))
    val r = SimHash.fingerprints(df).filter(col("doc_id") === 1L).collect().head
    val rebuilt = (0 until SimHash.BANDS).map(j =>
      r.getAs[Long](s"band_$j") << (j * SimHash.BAND_BITS)).sum
    assert(rebuilt == r.getAs[Long]("simhash"))
  }

  test("clusterSizeStats histograms planted duplicate clusters exactly") {
    // 4 singletons, one pair, one triple -> sizes {1:4, 2:1, 3:1}
    val docs = (Seq.tabulate(4)(i => s"unique doc $i") ++
      Seq.fill(2)("pair doc") ++ Seq.fill(3)("triple doc"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Dedup.clusterSizeStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((4L, 4L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
  }

  test("boilerplateDedup drops >maxDf spans EVERYWHERE, keeps rare and partial") {
    def span(p: String) = (1 to 10).map(p + _).mkString(" ")
    val boiler = span("b") // in 4 docs (df=4 > 2): dropped from ALL
    val rare = span("r")   // in 2 docs (df=2 <= 2): kept in both
    val tail = "t1 t2 t3"  // partial span in all docs: never a candidate
    val docs = (0 until 4).map { i =>
      val head = if (i < 2) rare + " " else ""
      (i.toLong, s"$head${span("u" + i)} $boiler $tail")
    }.toDF("doc_id", "text")
    val out = Dedup.boilerplateDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc0: rare + unique + boiler + tail = 4 spans, boiler dropped
    assert(out(0L).getAs[Long]("n_spans") == 4L)
    assert(out(0L).getAs[Long]("n_kept") == 3L)
    assert(out(0L).getAs[String]("clean_text") ==
      s"$rare ${span("u0")} $tail")
    // doc2 has no rare span: 3 spans, boiler dropped, tail kept
    assert(out(2L).getAs[Long]("n_kept") == 2L)
    assert(out(2L).getAs[String]("clean_text") == s"${span("u2")} $tail")
  }

  test("incremental screens incoming vs corpus only — never vs itself") {
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six seven eight"
    val corpus = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, a),                  // exact copy of corpus doc 1
      // same tokens as corpus doc 2 after lowering (identical shingles →
      // identical signature → LSH candidate, jaccard 1.0) but different
      // raw bytes → near-dup, NOT exact
      (11L, "One two three four five six seven Eight"),
      (12L, "totally fresh unrelated content right here"), // unique
      // exact copies of EACH OTHER, absent from the corpus: a batch-
      // internal pair must NOT be flagged (corpus-only screening)
      (13L, "same batch duplicate text goes here today"),
      (14L, "same batch duplicate text goes here today")
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(corpus, incoming).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L))
    assert(out(10L) == ((1, 1, 0))) // exact implies near (jaccard 1.0)
    assert(out(11L) == ((0, 1, 0)))
    assert(out(12L) == ((0, 0, 1)))
    assert(out(13L) == ((0, 0, 1)))
    assert(out(14L) == ((0, 0, 1)))
  }

  test("incremental maxBucket: caps the index-side mega bucket; exact " +
    "detection is untouched") {
    // a RAW (un-deduped) corpus with a 40-copy boilerplate cluster —
    // the misuse path buildIndex cannot collapse
    val boiler = "the same boilerplate page body repeated verbatim across"
    val corpus = (0L until 40L).map(i => (i, boiler))
      .toDF("doc_id", "text")
      .unionByName(Seq((50L, "a perfectly ordinary corpus document here"))
        .toDF("doc_id", "text"))
    val incoming = Seq(
      (100L, boiler),                                   // hits the mega bucket
      (101L, "a perfectly ordinary corpus document here"), // size-1 bucket dup
      (102L, "fresh text with nothing in common at all")
    ).toDF("doc_id", "text")
    def run(cap: Int) = Dedup.incremental(corpus, incoming, maxBucket = cap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    val uncapped = run(Int.MaxValue)
    val capped = run(10)
    // exact detection rides the HASH screen, not the banded join: the
    // boilerplate copy stays exact-flagged under the cap
    assert(uncapped(100L)._1 == 1 && capped(100L)._1 == 1)
    // near flag via the mega bucket disappears under the cap (the
    // documented tradeoff); the small-bucket near dup is unaffected
    assert(uncapped(100L)._2 == 1 && capped(100L)._2 == 0)
    assert(uncapped(101L) == ((1, 1, 0)) && capped(101L) == ((1, 1, 0)))
    assert(capped(102L) == ((0, 0, 1)))
  }

  test("exactScreenBloom: saturated filter forces false positives, flags stay exact") {
    import org.apache.spark.sql.functions.{call_function, col, lit, md5, xxhash64}
    // 60 distinct corpus docs into a 64-bit filter: guaranteed saturation
    val corpus = (1 to 60).map(i => (i.toLong, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    val incoming = (
      Seq((100L, "corpus document number 7 body"),   // true exact dup
          (101L, "corpus document number 42 body"))  // true exact dup
      ++ (102 to 140).map(i => (i.toLong, s"fresh incoming doc $i"))
    ).toDF("doc_id", "text")
    val hashes = Dedup.corpusHashes(corpus)
    val tinyBits = Some(64L)
    // the saturated filter really does pass non-dups (false positives)...
    val bytes = Dedup.buildBloom(hashes, numBits = tinyBits).get
    val maybes = incoming
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .filter(call_function("bloom_contains", lit(bytes),
        xxhash64(col("content_hash"))))
      .count()
    assert(maybes > 2, s"expected false positives through a 64-bit filter, got $maybes maybes")
    // ...and the verified flags are still exactly the membership truth
    val expect = ((100 to 101).map(_.toLong -> 1) ++ (102 to 140).map(_.toLong -> 0)).toMap
    val got = Dedup.exactScreenBloom(hashes, incoming, numBits = tinyBits)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect)
    // the right-sized (fpp-derived) filter agrees too
    val sized = Dedup.exactScreenBloom(hashes, incoming)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sized == expect)
  }

  test("sharded Bloom screen: >1 real shards, exactness preserved incl. under saturation") {
    val corpus = (1 to 60).map(i => (i.toLong, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    val incoming = (
      Seq((100L, "corpus document number 7 body"),   // true exact dup
          (101L, "corpus document number 42 body"))  // true exact dup
      ++ (102 to 140).map(i => (i.toLong, s"fresh incoming doc $i"))
    ).toDF("doc_id", "text")
    val hashes = Dedup.corpusHashes(corpus)
    // the sharded build really partitions: multiple populated shards,
    // each its own filter (this is the past-the-64-Mbit-cap contract —
    // per-kernel capacity bounded, total capacity = Σ shards)
    val filters = Dedup.buildBloomSharded(hashes, nShards = 4).get
    assert(filters.length == 4)
    val populated = filters.filter(_ != null)
    assert(populated.length > 1, "xxhash64 should populate >1 of 4 shards")
    assert(populated.map(_.toSeq).distinct.length == populated.length,
      "per-shard filters must differ (each holds its own shard's hashes)")
    val expect = ((100 to 101).map(_.toLong -> 1)
      ++ (102 to 140).map(_.toLong -> 0)).toMap
    // right-sized shards: flags are exactly the membership truth
    val sharded = Dedup.exactScreenBloom(hashes, incoming, nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sharded == expect)
    // saturated 64-bit shards force false positives through the
    // pre-filter, and the verify still restores exactness
    val tiny = Dedup.exactScreenBloom(hashes, incoming,
      numBits = Some(64L), nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tiny == expect)
    // and the sharded path agrees with the single-filter path
    val single = Dedup.exactScreenBloom(hashes, incoming)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sharded == single)
  }

  test("autoShards: one shard per 50M docs, crossing maxBloomShards' default exactly at 1e10") {
    assert(Dedup.autoShards(1L) == 1)
    assert(Dedup.autoShards(50000000L) == 1)
    assert(Dedup.autoShards(50000001L) == 2)
    assert(Dedup.autoShards(200000000L) == 4)
    // the handoff point: autoShards(1e10) == 200 == the default
    // maxBloomShards, so at >1e10 docs the screen selects the
    // semi-join, by construction not by coincidence
    assert(Dedup.autoShards(10000000000L) == 200)
    assert(Dedup.autoShards(10000000001L) == 201)
  }

  test("Bloom→semi-join crossover: past maxBloomShards no filter is built or probed, flags unchanged") {
    // the operating rule made executable: any broadcast membership
    // screen ships the whole filter set to every executor, so past the
    // production crossover (~200 shards ≈ 1.6 GB ≈ 1e10 docs) the
    // right screen is the exact bucketed semi-join the verify step
    // already is — exactScreenBloom now SELECTS it instead of the
    // comment recommending it
    val corpus = (1 to 60).map(i => (i.toLong, s"crossover corpus doc $i"))
      .toDF("doc_id", "text")
    val incoming = (
      Seq((100L, "crossover corpus doc 7"), (101L, "crossover corpus doc 42"))
      ++ (102 to 140).map(i => (i.toLong, s"crossover fresh doc $i"))
    ).toDF("doc_id", "text")
    val hashes = Dedup.corpusHashes(corpus)
    val expect = ((100 to 101).map(_.toLong -> 1)
      ++ (102 to 140).map(_.toLong -> 0)).toMap
    // below the threshold: the Bloom pre-filter is in the plan
    val bloomed = Dedup.exactScreenBloom(hashes, incoming, nShards = 4,
      maxBloomShards = 4)
    // analyzed plan, not optimized: over a LocalRelation fixture
    // Catalyst constant-folds the whole probe filter away — the
    // SELECTION is what's under test, and it is visible pre-fold
    assert(bloomed.queryExecution.analyzed.toString
      .contains("bloom_contains"),
      "at nShards <= maxBloomShards the plan must carry the Bloom probe")
    // past it: NO bloom anywhere in the plan — the semi-join alone
    // screens, and nothing was built, broadcast, or even materialized
    // (the bloom path cuts the hash set for its 3 consumers; the
    // semi-join regime reads it once and must not pay a cut)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val crossed = Dedup.exactScreenBloom(hashes, incoming, nShards = 8,
      maxBloomShards = 4)
    assert(spark.sparkContext.getPersistentRDDs.size == rddsBefore,
      "the crossed-over screen must not localCheckpoint anything")
    assert(!crossed.queryExecution.analyzed.toString
      .contains("bloom_contains"),
      "past maxBloomShards the plan must not contain a Bloom probe")
    // same answer on both sides of the crossover (the pre-filter is
    // result-invisible by construction)
    val a = bloomed.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = crossed.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == expect && b == expect)
  }

  test("sharded Bloom screen survives a null-text corpus doc (matches single path)") {
    // md5(null) = null content_hash → null shard key; the sharded build
    // must drop it (bloom_build itself ignores nulls) instead of NPEing
    // on the null groupBy row, and flags must equal the single path's
    val corpus = ((1 to 20).map(i => (i.toLong, s"corpus doc $i"))
      :+ (99L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val incoming = Seq((100L, "corpus doc 7"), (101L, "brand new"),
      (102L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val hashes = Dedup.corpusHashes(corpus)
    val sharded = Dedup.exactScreenBloom(hashes, incoming, nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val single = Dedup.exactScreenBloom(hashes, incoming)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sharded == Map(100L -> 1, 101L -> 0, 102L -> 0))
    assert(sharded == single)
  }

  test("bloom_contains_sharded native == when-chain bitwise at nShards=16, one plan node, zero filter literals") {
    val corpus = (1 to 200).map(i => (i.toLong, s"sharded native corpus doc $i"))
      .toDF("doc_id", "text")
    val filters = Dedup.buildBloomSharded(Dedup.corpusHashes(corpus),
      nShards = 16).get
    assert(filters.length == 16)
    // probe domain: all members + fresh values — both flag classes
    val probes = ((1 to 200).map(i => s"sharded native corpus doc $i")
      ++ (1 to 300).map(i => s"fresh probe text $i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pv = xxhash64(md5(col("text")))
    val native = Dedup.shardedBloomProbe(spark, filters, pv)
    val chain = Dedup.shardedBloomProbeWhenChain(filters, pv)
    assert(spark.catalog.functionExists("bloom_contains_sharded"),
      "spec session must exercise the NATIVE path")
    val rows = probes.select(col("doc_id"), native.as("n"), chain.as("c"))
      .collect()
    assert(rows.forall(r => r.getBoolean(1) == r.getBoolean(2)),
      "native and when-chain flags must be bitwise equal per row")
    val hits = rows.count(_.getBoolean(1))
    assert(hits >= 200, s"all 200 members must flag (got $hits)")
    assert(hits < rows.length, "fresh probes must include definite-new rows")

    // plan shape: ONE reference-object node, no CASE WHEN dispatch, no
    // per-shard binary literals — the O(1)-plan-size contract. Probe
    // over range() (a LocalRelation would be folded away by
    // ConvertToLocalRelation, erasing the Filter).
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Literal}
    import org.apache.spark.sql.types.BinaryType
    val rangeVal = xxhash64(col("id"))
    val nativePlan = spark.range(1000)
      .filter(Dedup.shardedBloomProbe(spark, filters, rangeVal))
      .queryExecution.optimizedPlan
    val nativeNodes = nativePlan.flatMap(_.expressions).flatMap(_.collect {
      case b: graft.functions.BloomContainsSharded => b })
    assert(nativeNodes.size == 1, s"expected 1 native node, got $nativeNodes")
    assert(nativePlan.flatMap(_.expressions).flatMap(_.collect {
      case c: CaseWhen => c }).isEmpty, "native dispatch must not be a when-chain")
    assert(nativePlan.flatMap(_.expressions).flatMap(_.collect {
      case l @ Literal(v, BinaryType) if v != null => l }).isEmpty,
      "no shard filter bytes may appear as plan literals")
    // ...while the when-chain form carries one binary literal PER
    // populated shard (the plan-size growth the native removes)
    val chainPlan = spark.range(1000)
      .filter(Dedup.shardedBloomProbeWhenChain(filters, rangeVal))
      .queryExecution.optimizedPlan
    val chainLits = chainPlan.flatMap(_.expressions).flatMap(_.collect {
      case l @ Literal(v, BinaryType) if v != null => l })
    assert(chainLits.size == filters.count(_ != null))
  }

  test("bloom_contains_sharded: empty shards are definite-new; null probe matches bloom_contains' null") {
    // 6 docs over 64 shards: most shards EMPTY — values routing there
    // must come back false without probing anything
    val corpus = (1 to 6).map(i => (i.toLong, s"tiny corpus member $i"))
      .toDF("doc_id", "text")
    val filters = Dedup.buildBloomSharded(Dedup.corpusHashes(corpus),
      nShards = 64).get
    assert(filters.count(_ == null) > 40, "most of 64 shards must be empty")
    val probes = ((1 to 6).map(i => s"tiny corpus member $i")
      ++ (1 to 500).map(i => s"empty shard probe $i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pv = xxhash64(md5(col("text")))
    val rows = probes.select(
      Dedup.shardedBloomProbe(spark, filters, pv).as("n"),
      Dedup.shardedBloomProbeWhenChain(filters, pv).as("c"),
      pmod(pv, lit(64L)).cast("int").as("s")).collect()
    assert(rows.forall(r => r.getBoolean(0) == r.getBoolean(1)))
    val emptyShards = filters.zipWithIndex.collect {
      case (null, i) => i }.toSet
    val routedEmpty = rows.filter(r => emptyShards.contains(r.getInt(2)))
    assert(routedEmpty.nonEmpty, "some probes must route to empty shards")
    assert(routedEmpty.forall(!_.getBoolean(0)),
      "an empty shard is definite-new (false), never a probe hit")

    // null probe value: the native follows bloom_contains (null → null);
    // the legacy chain yields false via its otherwise — identical under
    // a filter (both drop), spec'd here so the divergence is deliberate
    val nulls = Seq(Tuple1(Option.empty[Long])).toDF("v")
    val nr = nulls.select(
      call_function("bloom_contains_sharded",
        typedlit(filters.toSeq), col("v")).as("n"),
      Dedup.shardedBloomProbeWhenChain(filters, col("v")).as("c"))
      .collect().head
    assert(nr.isNullAt(0), "native: null probe → null (bloom_contains semantics)")
    assert(!nr.getBoolean(1), "when-chain: null probe → false (otherwise)")
  }

  test("incrementalLoop: kept docs join the index, rejected docs never do") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val corpus = Seq((1L, a)).toDF("doc_id", "text")
    val b1 = Seq(
      (10L, a.replace("zeta", "ZETA")), // near-dup of corpus doc 1 → rejected
      (11L, b)                          // fresh → kept, merged into index
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, b),                          // exact copy of b1-KEPT doc 11
      (21L, a.replace("zeta", "ZETA")),  // exact copy of b1-REJECTED doc 10:
                                         // 10 never entered the corpus, so no
                                         // exact hit — but its original (doc 1)
                                         // is there and near-screens it
      (22L, a),                          // exact copy of the original corpus
      (23L, "completely different words appear in this one")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalLoop(corpus, Seq("b1" -> b1, "b2" -> b2))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(out(10L) == ((0, 1, 0, "b1")))
    assert(out(11L) == ((0, 0, 1, "b1")))
    assert(out(20L) == ((1, 1, 0, "b2"))) // caught ONLY because 11 was merged
    assert(out(21L) == ((0, 1, 0, "b2"))) // near via doc 1, exact correctly 0
    assert(out(22L) == ((1, 1, 0, "b2")))
    assert(out(23L) == ((0, 0, 1, "b2")))
    // the pre-staged-index entry point (incrementalLoopFrom — the
    // production loaded-index shape the variance probe times) is
    // flag-identical to the in-query-build gate form
    val corp = corpus.select(col("doc_id"), col("text"))
    val built = Dedup.buildIndex(corp)
    val staged = graft.dedup.DedupIndex(
      built.hashes.localCheckpoint(), built.bands.localCheckpoint())
    val from = Dedup.incrementalLoopFrom(corp, staged,
      Seq("b1" -> b1, "b2" -> b2)).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(from == out)
  }

  test("incrementalLoop cold start: an EMPTY initial corpus bootstraps the index from batch 1") {
    // the first-crawl-ever shape: no corpus, no index — batch 1 is all
    // fresh (batch-internal near-dups deliberately unflagged, both
    // kept), batch 2 screens against what batch 1 merged in
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val b1 = Seq(
      (10L, a),                          // fresh → kept
      (11L, a.replace("zeta", "ZETA"))   // near-dup WITHIN the batch:
                                         // unflagged (neither is in the
                                         // corpus yet), also kept
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, a),                                   // exact copy of kept 10
      (21L, a.replace("theta", "THETA")),         // near-dup of kept 10
      (22L, "entirely different content here now") // fresh
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalLoop(corpus, Seq("b1" -> b1, "b2" -> b2))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(out(10L) == ((0, 0, 1, "b1")))
    assert(out(11L) == ((0, 0, 1, "b1")))
    assert(out(20L) == ((1, 1, 0, "b2"))) // caught by the bootstrapped index
    assert(out(21L) == ((0, 1, 0, "b2")))
    assert(out(22L) == ((0, 0, 1, "b2")))
  }
}
