package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Text
import graft.config.Checkpoints.CutSyntax

/** Deduplication operators for LLM training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing ever materializes the O(n²) pair space — every
  * near-dup operator first buckets (length/lang block, LSH band, SimHash
  * band) and only joins within buckets. The bucket join shuffles on the
  * bucket key; bucket sizes are bounded by construction.
  *
  * The lineage cuts in this file (`cutLineage()`,
  * [[graft.config.Checkpoints]]) follow the SURVEY §5 cluster-loss
  * contract: executor-local `localCheckpoint` by default — on a
  * preemptible cluster set `graft.checkpoint=reliable` (+
  * `setCheckpointDir`) to make every cut recoverable; the
  * staged-parquet path for the incremental index already exists as
  * class (c).
  */
/** Persisted screening index for [[Dedup.incrementalFromIndex]]:
  * `hashes` is the corpus content-hash set (`content_hash`), `bands`
  * the banded MinHash signature rows (`id, sigv, band, bsig` — the
  * [[MinHashSpec.bandedSignatures]] layout). Both frames are plain
  * DataFrames so they persist as ordinary tables (parquet/bucketed)
  * and reload across screening runs.
  */
final case class DedupIndex(hashes: DataFrame, bands: DataFrame)

object Dedup {

  /** Exact dedup via content hash. One shuffle on the 128-bit hash.
    * Output: every row tagged with its content hash, the canonical
    * (minimum) doc id of its duplicate class, and whether it would be
    * dropped by `keep-first` policy.
    *
    * NULL-text contract: a missing payload is not CONTENT — it is never
    * a duplicate of another missing payload, so every null-text doc is
    * its own singleton class (keeps itself, `is_duplicate` 0,
    * `text_hash` NULL in the output). Mechanically this needs a per-doc
    * surrogate class key: null never equi-joins, so keying classes on
    * the raw hash would silently DROP every null-text row at the class
    * join — the failure mode this contract exists to close. The 'N'
    * prefix cannot collide with a real key (md5 emits 32 hex chars).
    *
    * A row with a null id AND a null text has NO identity — the
    * surrogate itself null-propagates and the row would fall through
    * the same silent-drop hole one level down. No deterministic key can
    * both preserve and distinguish such rows, so the contract is
    * explicit: ids must be non-null wherever text is null, enforced by
    * a lazily-evaluated raise_error arm (zero cost unless hit; enforce
    * upstream with `Etl.validateRules`/`pkCheck` on real pipelines).
    */
  /** The NULL-text surrogate class key shared by batch and streaming
    * dedup: the content hash when text is present, 'N'||id for null
    * text, and a LOUD contract error (lazily evaluated — free on the
    * happy path) when both are null and the row has no identity.
    */
  def surrogateKey(contentHash: Column, id: Column, site: String): Column =
    coalesce(contentHash,
      concat(lit("N"), id.cast("string")),
      raise_error(lit(s"$site: row with null id AND null text has no " +
        "identity — enforce non-null ids upstream " +
        "(Etl.validateRules/pkCheck)")))

  def exact(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    // only __k is shuffled; text_hash is re-derived after the join ('N'
    // is not a hex char, so surrogates are recognizable), keeping the
    // shuffled row exactly as wide as before the null contract
    val hashed = df.select(col(idCol),
      surrogateKey(md5(col(textCol)), col(idCol), "dedup.exact").as("__k"))
    val classes = hashed.groupBy(col("__k"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
    hashed.join(classes, "__k")
      .select(col(idCol),
        when(col("__k").startsWith("N"), lit(null).cast("string"))
          .otherwise(col("__k")).as("text_hash"),
        col("keep_id"), col("n_copies"),
        (col(idCol) =!= col("keep_id")).cast("int").as("is_duplicate"))
  }

  /** Duplicate-cluster SIZE histogram over [[exact]]'s classes: how
    * many clusters have 1, 2, … members — THE diagnostic that prices
    * every pair-emitting stage before running it (candidate pairs and
    * postings joins are Σ cluster², so one mega-cluster dominates; the
    * §8a scale tables attribute every super-linear ratio to exactly
    * this distribution). Two bounded aggregations after the one content
    * shuffle; output is at most |distinct cluster sizes| rows.
    */
  def clusterSizeStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    // [[exact]]'s NULL-text contract, histogram form: each null-text row
    // is its own singleton cluster — emitted as a size-1 row per null
    // doc rather than one spurious mega-cluster of all nulls (which is
    // exactly the skew signature this diagnostic exists to flag).
    // One scan, two exchanges, unchanged: groupBy collects all nulls
    // into one group whose COUNT is the number of null docs, and that
    // group re-enters the histogram as `count` clusters of size 1 (a
    // weighted row) instead of one cluster of size `count`.
    df.select(md5(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash")).agg(count(lit(1)).as("cnt"))
      .select(
        when(col("text_hash").isNull, lit(1L)).otherwise(col("cnt"))
          .as("cluster_size"),
        when(col("text_hash").isNull, col("cnt")).otherwise(lit(1L))
          .as("__w"))
      .groupBy(col("cluster_size"))
      .agg(sum(col("__w")).as("n_clusters"),
        (sum(col("__w")) * col("cluster_size")).as("n_docs"))
  }

  /** Fuzzy-exact dedup: [[exact]] over [[Text.normalize]]d text, so
    * case / punctuation / whitespace variants fall into one duplicate
    * class. Same single-shuffle shape as exact; the standard first pass
    * of an LLM corpus dedup cascade (normalize → exact → MinHash).
    */
  def exactNormalized(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    exact(df.withColumn("__norm", Text.normalize(col(textCol)))
        .drop(textCol),
      idCol, "__norm")

  /** End-to-end corpus clean — the composed dedup cascade a training-data
    * pipeline actually runs, in one call:
    *   1. fuzzy-exact classes over normalized text → drop all but the
    *      minimum doc id of each class;
    *   2. MinHash-LSH propose → exact Jaccard verify (≥ `threshold`) →
    *      for each verified near-dup pair, drop the larger doc id.
    * Returns the surviving corpus. Deterministic (min-id keep policy both
    * stages); every stage is the bucketed/linear shape documented on the
    * underlying operators — nothing here re-introduces an all-pairs cost.
    * Pair-drop (not connected components): B dropped for A and C dropped
    * for B is transitively fine since drops only ever REMOVE docs; the
    * kept set is exactly {docs that are no pair's larger id}.
    */
  def cleanCorpus(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", k: Int = 3,
                  threshold: Double = 0.5,
                  maxBucket: Int = Int.MaxValue): DataFrame = {
    val exactDrops = exactNormalized(df, idCol, textCol)
      .filter(col("is_duplicate") === 1).select(col(idCol))
      .cutLineage()
    // Propose/verify on the EXACT SURVIVORS only — the canonical crawl
    // cascade (exact first, fuzzy on what remains). This is not just a
    // cost win (fewer docs shingled and banded): a mega-duplicate
    // cluster (one boilerplate page crawled m times) collapses to one
    // representative BEFORE banding, so the LSH self-join never sees
    // the C(m,2) bucket. `maxBucket` then guards the residual case the
    // exact stage can't collapse (mega NEAR-dup clusters — same page,
    // differing timestamp line).
    val survivors = df.join(exactDrops, Seq(idCol), "left_anti")
    val nearDrops = jaccardOnCandidates(survivors, idCol, textCol, k,
        threshold, maxBucket = maxBucket)
      .select(col("doc_b").as(idCol))
    val drops = exactDrops.unionByName(nearDrops).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** The (id, block, shingle) frame both shingle-pair operators
    * ([[ngramJaccard]], [[containment]]) index — distinct k-token
    * shingles per doc, exploded long. Deliberately NOT materialized and
    * NOT pre-partitioned: the operators hang their self-join off ONE
    * `repartition(blk, w)` exchange that AQE's ReuseExchange shares
    * across both join sides (and the semi-join/sizes consumers), so the
    * exploded table is shuffled exactly once, while the per-doc /
    * per-shingle aggregates read the RAW frame and shrink map-side
    * (partial agg) to doc- / vocab-sized shuffles. That trades one
    * extra scan+explode (scan-local CPU, columnar read) for a full
    * shuffle + a cluster-loss-sensitive localCheckpoint materialization
    * of the biggest intermediate — the right side of the trade at
    * 100 TB, and measured faster at sf1 (§8h). An earlier revision cut
    * the frame here; under AQE a checkpointed LogicalRDD reports
    * UnknownPartitioning, so every consumer re-shuffled it.
    */
  private def shingledWords(df: DataFrame, idCol: String, textCol: String,
                            blockCol: String, k: Int): DataFrame =
    df.withColumn("__toks", Text.tokens(col(textCol)))
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        explode(expr(Text.shingleExpr("__toks", k))).as("w"))

  /** N-gram Jaccard similarity over k-token shingle sets.
    * Blocking on `blockCol` bounds the pair space; within a block the
    * intersection is computed by exploding distinct shingles and joining
    * on the shingle — one shuffle on (block, shingle), never a cross
    * product. Shingles (not unigrams) keep the join sparse: bucket size
    * is docs-per-shingle, which stays small even for tiny vocabularies.
    */
  def ngramJaccard(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", blockCol: String = "lang",
                   k: Int = 3, threshold: Double = 0.5,
                   digits: Int = 4): DataFrame = {
    val raw = shingledWords(df, idCol, textCol, blockCol, k)
    // one (blk, w) exchange feeds BOTH self-join sides (ReuseExchange);
    // sizes reads the raw frame so its shuffle is the doc-sized partial
    // aggregate, not the exploded table
    val words = raw.repartition(col("blk"), col("w"))
    val sizes = raw.groupBy(col("id")).agg(count(lit(1)).as("n_words"))
    val a = words.select(col("blk"), col("id").as("id_a"), col("w"))
    val b = words.select(col("blk"), col("id").as("id_b"), col("w"))
    val inter = a.join(b, Seq("blk", "w"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_words", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_words", "n_b"), "id_b")
      .withColumn("jaccard", round(col("n_common") /
        (col("n_a") + col("n_b") - col("n_common")), digits))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
  }

  /** The 100 TB shape of near-dup detection: MinHash-LSH proposes
    * candidate pairs (cheap, band-bucketed), then exact shingle Jaccard
    * verifies ONLY those pairs. Cost is Σ_candidates |shingles(A)| —
    * linear in candidate count — where all-pairs [[ngramJaccard]] grows
    * quadratically with duplicate-cluster size.
    */
  def jaccardOnCandidates(df: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", k: Int = 3,
                          threshold: Double = 0.5, digits: Int = 4,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    // localCheckpoint (not cache): materializes the LSH propose pipeline
    // once for the three consumers below, truncates its lineage, and
    // leaves no CacheManager entry behind (see ngramJaccard note).
    val cand = MinHashSpec.candidatePairs(df, idCol, textCol,
        maxBucket = maxBucket)
      .select(col("doc_a"), col("doc_b")).cutLineage()
    // Verify pass touches ONLY documents that appear in a candidate pair:
    // the semi-join prunes the corpus before the shingle explode, so
    // verify cost is Σ_candidate-docs |shingles|, independent of corpus
    // size. Without it the explode would re-shingle all N documents to
    // verify a handful of pairs.
    val candIds = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("id")).distinct()
    val words = df
      .join(candIds, df(idCol) === candIds("id"), "left_semi")
      .withColumn("__toks", Text.tokens(col(textCol)))
      .select(col(idCol).as("id"),
        explode(expr(Text.shingleExpr("__toks", k))).as("w"))
    val sizes = words.groupBy(col("id")).agg(count(lit(1)).as("n_words"))
    val inter = cand
      .join(words.select(col("id").as("doc_a"), col("w")), Seq("doc_a"))
      .join(words.select(col("id").as("doc_b"), col("w")), Seq("doc_b", "w"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("n_words").as("n_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("n_words").as("n_b")), "doc_b")
      .withColumn("jaccard", round(col("n_common") /
        (col("n_a") + col("n_b") - col("n_common")), digits))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Incremental (new-batch-vs-corpus) dedup — the continuous-crawl
    * shape: an INCOMING batch is screened against the EXISTING corpus
    * and never against itself, so re-ingesting what the corpus already
    * holds is caught without re-running corpus-wide dedup. Two screens,
    * flags independent: exact (md5 content match against the corpus
    * hash set) and near (incoming LSH bands joined against CORPUS bands
    * only — the pair space is |incoming candidates|, not corpus² —
    * then exact shingle-Jaccard verification of just those pairs).
    * Output is one row per incoming doc: `(id, is_dup_exact,
    * is_dup_near, kept)`.
    *
    * Scale shape: in production the corpus-side md5 set and banded
    * signatures are a PERSISTED INDEX maintained incrementally (the
    * same train-once/reuse loop as the IVF quantizer); here they are
    * derived in-query, which prices the first build. Every join keys on
    * a bounded hash (md5 / band signature), the verify explode is
    * semi-join-pruned to candidate docs, and nothing materializes a
    * cross product.
    */
  def incremental(corpus: DataFrame, incoming: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  k: Int = 3, threshold: Double = 0.5,
                  digits: Int = 4,
                  maxBucket: Int = Int.MaxValue): DataFrame =
    incrementalFromIndex(corpus, buildIndex(corpus, idCol, textCol),
      incoming, idCol, textCol, k, threshold, digits,
      maxBucket = maxBucket)

  /** The persisted screening index behind [[incremental]]: the corpus
    * content-hash set (exact screen) and its banded MinHash signatures
    * (near-screen bucket coordinates). Both are bounded per doc (~16 B
    * hash + ~BANDS band rows), so the index is a small fraction of the
    * corpus and cheap to store/shuffle. [[mergeIndex]] maintains it
    * incrementally as batches are accepted — the build cost is paid
    * once per doc, ever, not once per screening run.
    */
  def buildIndex(corpus: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DedupIndex = DedupIndex(
    corpusHashes(corpus, textCol),
    MinHashSpec.bandedSignatures(corpus, idCol, textCol))

  /** Persist a [[DedupIndex]] as BUCKETED, bucket-sorted parquet tables:
    * hashes clustered by `content_hash`, bands by `(band, bsig)` — the
    * exact keys every screening run joins on. This is the LAYOUT lever
    * of the incremental loop at 100 TB: the index is written once per
    * version but joined by every crawl batch, and a bucketed scan
    * reports its hash partitioning to Catalyst, so the screen's
    * index-side Exchange disappears from every run — shuffle cost
    * becomes ∝ the incoming batch, never ∝ the corpus-sized index
    * (see [[loadIndexBucketed]]; the plan spec pins the shape).
    * `nBuckets` is a production dial — size it so a bucket of the
    * BANDS-fold band table fits an executor core's scan budget.
    *
    * Each bucket is written as ONE file (the repartition below aligns
    * writer tasks with buckets — Spark's bucket id and repartition both
    * hash with Murmur3 mod n), which also lets the sorted-scan path
    * elide the join sort. Tables are registered in the session catalog
    * (`<tablePrefix>_hashes` / `<tablePrefix>_bands`) with the data at
    * `dir` — external, so the files outlive any one session and
    * [[loadIndexBucketed]] can re-attach them elsewhere.
    */
  def saveIndexBucketed(spark: SparkSession, index: DedupIndex, dir: String,
                        nBuckets: Int = 8,
                        tablePrefix: String = "graft_bidx"): Unit = {
    def one(df: DataFrame, cols: Seq[String], sub: String): Unit = {
      val tbl = s"${tablePrefix}_$sub"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      df.repartition(nBuckets, cols.map(col): _*)
        .write.format("parquet")
        .bucketBy(nBuckets, cols.head, cols.tail: _*)
        .sortBy(cols.head, cols.tail: _*)
        .option("path", s"$dir/$sub")
        .mode("overwrite")
        .saveAsTable(tbl)
    }
    one(index.hashes, Seq("content_hash"), "hashes")
    one(index.bands, Seq("band", "bsig"), "bands")
  }

  /** Re-attach a bucketed index written by [[saveIndexBucketed]] in THIS
    * session (catalog entries are per-session; the parquet files are
    * not): idempotently registers the external bucketed tables over the
    * files — schema read from the parquet footers, bucket spec restated
    * — and returns them as a [[DedupIndex]]. The returned frames' scans
    * carry `HashPartitioning(content_hash)` / `HashPartitioning(band,
    * bsig)`, which is what removes the index-side Exchange from
    * [[incrementalFromIndex]]'s screens.
    */
  def loadIndexBucketed(spark: SparkSession, dir: String, nBuckets: Int = 8,
                        tablePrefix: String = "graft_bidx"): DedupIndex = {
    def attach(sub: String, bucketCols: Seq[String]): DataFrame = {
      val tbl = s"${tablePrefix}_$sub"
      if (spark.catalog.tableExists(tbl)) {
        // identity check (ADVICE r13): a bare tableExists short-circuit
        // would hand back whatever table already holds the name — two
        // indexes loaded in one session under the default prefix (or a
        // changed nBuckets) silently read the FIRST dir's data for the
        // second. Validate the catalog entry's LOCATION and bucket count
        // against this call's arguments; on mismatch drop and re-attach.
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        val sameLoc = meta.storage.locationUri.exists { u =>
          val want = s"$dir/$sub"
          if (u.getScheme == null || u.getScheme == "file")
            // local paths: canonicalize both sides so relative vs
            // absolute spellings of the same dir compare equal
            new java.io.File(u.getPath).getCanonicalPath ==
              new java.io.File(want).getCanonicalPath
          else u.toString.stripSuffix("/") == want.stripSuffix("/")
        }
        val sameBuckets = meta.bucketSpec.exists(_.numBuckets == nBuckets)
        if (!(sameLoc && sameBuckets)) spark.sql(s"DROP TABLE IF EXISTS $tbl")
      }
      if (!spark.catalog.tableExists(tbl)) {
        val ddl = spark.read.parquet(s"$dir/$sub").schema.toDDL
        val keys = bucketCols.mkString(", ")
        spark.sql(
          s"""CREATE TABLE $tbl ($ddl) USING parquet
             CLUSTERED BY ($keys) SORTED BY ($keys) INTO $nBuckets BUCKETS
             LOCATION '$dir/$sub'""")
      }
      spark.table(tbl)
    }
    DedupIndex(attach("hashes", Seq("content_hash")),
      attach("bands", Seq("band", "bsig")))
  }

  /** The exact-screen half of the index alone: the distinct content-hash
    * set. [[exactScreenBloom]] needs only this — building the full
    * [[DedupIndex]] would eagerly derive the banded MinHash signatures
    * it never reads.
    */
  def corpusHashes(corpus: DataFrame, textCol: String = "text"): DataFrame =
    corpus.select(md5(col(textCol)).as("content_hash")).distinct()

  /** Fold a batch's ACCEPTED (kept) docs into the index. Contract: the
    * kept docs' ids are disjoint from those already indexed (they were
    * just screened as new). The `.distinct()` is load-bearing for the
    * WITHIN-batch case: batch-internal duplicates are deliberately
    * un-flagged by the screen (neither copy is in the corpus yet), so
    * one merge can receive several kept docs with identical content —
    * they must collapse to one hash row. ACROSS merges duplicate
    * content cannot arrive: the later copy is exact-flagged by the
    * already-merged hash and rejected.
    */
  def mergeIndex(index: DedupIndex, keptDocs: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text",
                 keptBands: Option[DataFrame] = None): DedupIndex = DedupIndex(
    index.hashes
      .union(keptDocs.select(md5(col(textCol)).as("content_hash")))
      .distinct(),
    // keptBands: signatures the caller already derived for these docs
    // (the screening run computes the full batch's bands — re-deriving
    // the kept subset's MinHash from raw text would double the loop's
    // dominant cost); default derives them for standalone merges
    index.bands.union(keptBands.getOrElse(
      MinHashSpec.bandedSignatures(keptDocs, idCol, textCol))))

  /** [[incremental]] against a PREBUILT [[DedupIndex]] — the production
    * path: the index is loaded, not derived, so a screening run costs
    * only the incoming batch's signatures plus candidate-pruned
    * verification. `corpus` is still needed for the verify stage (the
    * shingle sets of candidate corpus docs); it must contain every doc
    * the index covers.
    */
  def incrementalFromIndex(corpus: DataFrame, index: DedupIndex,
                           incoming: DataFrame,
                           idCol: String = "doc_id", textCol: String = "text",
                           k: Int = 3, threshold: Double = 0.5,
                           digits: Int = 4,
                           incomingBands: Option[DataFrame] = None,
                           maxBucket: Int = Int.MaxValue,
                           emitHash: Boolean = false)
      : DataFrame = {
    val exactDup = incoming
      .select(col(idCol), md5(col(textCol)).as("content_hash"))
      .join(index.hashes, Seq("content_hash"), "left_semi")
      .select(col(idCol)).withColumn("is_dup_exact", lit(1))
    // maxBucket mirrors [[MinHashSpec.candidatePairs]]'s mega-cluster
    // guard on the INDEX side: a bucket of m near-identical corpus docs
    // costs every matching incoming doc m candidate pairs (and m shingle
    // verifies). The loop's own index never holds exact-identical
    // clusters (mergeIndex collapses them), but an index built over a
    // raw corpus — or a legitimate sub-threshold template cluster — can.
    // Exact detection is never affected: that's the hash screen above.
    val indexBands =
      if (maxBucket == Int.MaxValue) index.bands
      else index.bands
        .withColumn("__bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bsig"))))
        .filter(col("__bn") <= maxBucket).drop("__bn")
    // incomingBands: a caller that also MAINTAINS the index (the loop)
    // derives the batch's signatures once and shares them between the
    // screen and the merge
    val cand = incomingBands
      .getOrElse(MinHashSpec.bandedSignatures(incoming, idCol, textCol)).as("x")
      .join(indexBands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .distinct().cutLineage()
    def words(df: DataFrame, side: String) = df
      .join(cand.select(col(side).as("id")).distinct(),
        df(idCol) === col("id"), "left_semi")
      .withColumn("__toks", Text.tokens(col(textCol)))
      .select(col(idCol).as("id"),
        explode(expr(Text.shingleExpr("__toks", k))).as("w"))
    val wa = words(incoming, "doc_a")
    val wb = words(corpus, "doc_b")
    val sa = wa.groupBy(col("id")).agg(count(lit(1)).as("n_a"))
    val sb = wb.groupBy(col("id")).agg(count(lit(1)).as("n_b"))
    val nearDup = cand
      .join(wa.select(col("id").as("doc_a"), col("w")), Seq("doc_a"))
      .join(wb.select(col("id").as("doc_b"), col("w")), Seq("doc_b", "w"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sa.select(col("id").as("doc_a"), col("n_a")), "doc_a")
      .join(sb.select(col("id").as("doc_b"), col("n_b")), "doc_b")
      .filter(round(col("n_common") /
        (col("n_a") + col("n_b") - col("n_common")), digits) >= threshold)
      .select(col("doc_a").as(idCol)).distinct()
      .withColumn("is_dup_near", lit(1))
    // emitHash (r15): a caller that MERGES the kept docs into the index
    // (the loop / streaming step) needs their content hashes right
    // after the screen — carrying them on the flags spine (the spine
    // scans `incoming` anyway; the md5 is incremental scan-local CPU)
    // lets the merge read the MATERIALIZED flags instead of re-scanning
    // and re-hashing the batch. Hidden column, appended LAST; callers
    // drop it before the flags frame leaves the operator.
    val spine =
      if (emitHash)
        incoming.select(col(idCol), md5(col(textCol)).as("__content_hash"))
      else incoming.select(col(idCol))
    spine
      .join(exactDup, Seq(idCol), "left")
      .join(nearDup, Seq(idCol), "left")
      .select(Seq(col(idCol),
        coalesce(col("is_dup_exact"), lit(0)).as("is_dup_exact"),
        coalesce(col("is_dup_near"), lit(0)).as("is_dup_near"),
        (coalesce(col("is_dup_exact"), lit(0)) === 0 &&
          coalesce(col("is_dup_near"), lit(0)) === 0)
          .cast("int").as("kept")) ++
        (if (emitHash) Seq(col("__content_hash")) else Nil): _*)
  }

  /** Serialize the index's content-hash set into a Bloom filter (Spark's
    * own sketch, via the `bloom_build` session function). Returns None in
    * an extension-free session — callers fall back to the un-screened
    * path, which is value-identical.
    *
    * At 100 TB the hash SET is ~16 B/doc and must be joined; the Bloom
    * filter is ~1.2 B/doc at 1% fpp and BROADCASTS, so the exact screen
    * of a crawl batch becomes a map-side probe: definite-new docs (the
    * vast majority of a healthy crawl) never enter the verification join
    * at all. Production builds this once per index version and persists
    * the bytes next to the index; the in-query build prices that first
    * construction. `numBits` caps at 64 Mbit (Spark's runtime-filter
    * default ceiling, 8 MB serialized — ~50 M docs at 1% fpp); beyond
    * that, [[buildBloomSharded]] shards the filter by hash prefix and
    * probes the matching shard.
    */
  def buildBloom(hashes: DataFrame, fpp: Double = 0.01,
                 numBits: Option[Long] = None): Option[Array[Byte]] =
    buildBloomOver(hashes, xxhash64(col("content_hash")), fpp, numBits)

  /** Sharded Bloom build — the past-the-cap path: the hash set is
    * partitioned by hash prefix (pmod(xxhash64(h), nShards)) and each
    * shard gets its OWN filter, so total capacity scales linearly with
    * nShards while every single kernel invocation stays inside Spark's
    * 64 Mbit runtime-filter ceiling (the single filter saturates past
    * ~50 M docs at 1% fpp — production picks nShards = ⌈n / 5e7⌉).
    * Filters are sized uniformly for the LARGEST shard's count (xxhash64
    * spreads evenly, and an oversized filter only lowers fpp), one
    * bounded counts pass + ONE groupBy(bloom_build) pass builds all
    * shards — the probe side then reads exactly one shard per row
    * ([[exactScreenBloom]] with nShards > 1). Returns the shard-indexed
    * filter array (null = empty shard, i.e. definite-new); None in an
    * extension-free session.
    */
  def buildBloomSharded(hashes: DataFrame, nShards: Int, fpp: Double = 0.01,
                        numBits: Option[Long] = None)
      : Option[Array[Array[Byte]]] = {
    val spark = hashes.sparkSession
    if (!spark.catalog.functionExists("bloom_build") || nShards < 1) None
    else {
      val v = xxhash64(col("content_hash"))
      // a null content_hash (null-text doc) can never match the verify
      // semi-join, and bloom_build itself ignores nulls — but a null
      // SHARD key would surface here as a null groupBy row that NPEs
      // the collect; drop it up front (the single-filter path's
      // behavior, kept identical)
      val withShard = hashes.filter(col("content_hash").isNotNull)
        .withColumn("__shard", pmod(v, lit(nShards.toLong)).cast("int"))
      val counts = withShard.groupBy(col("__shard")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxN = math.max(1L, counts.values.foldLeft(0L)(math.max))
      val bits = numBits.getOrElse {
        val optimal = math.ceil(
          -maxN * math.log(fpp) / (math.log(2) * math.log(2))).toLong
        math.min(67108864L, math.max(64L, optimal))
      }
      val built = withShard.groupBy(col("__shard"))
        .agg(call_function("bloom_build", v, lit(maxN), lit(bits)).as("bf"))
        .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bf")).toMap
      Some(Array.tabulate(nShards)(s => built.getOrElse(s, null)))
    }
  }

  /** Production shard sizing for the Bloom screen, as code rather than
    * the recurring ⌈n/5e7⌉ comment: one shard per ~50 M corpus docs
    * keeps every filter inside Spark's 64 Mbit runtime-filter ceiling
    * at 1% fpp. Crosses `exactScreenBloom`'s default `maxBloomShards`
    * (200) exactly at 1e10 docs — the point where the broadcast filter
    * set (~1.6 GB) stops paying for itself and the screen selects the
    * exact bucketed semi-join instead.
    */
  def autoShards(nDocs: Long): Int =
    math.max(1L, (nDocs + 49999999L) / 50000000L).toInt

  /** Per-row probe of a sharded filter set: the native
    * `bloom_contains_sharded` when registered — ONE expression node
    * holding the whole shard array as a reference object
    * (functions/BloomSharded.scala; the PqCodes discipline), O(1)
    * dispatch per row and O(1) PLAN size in nShards (the bytes ride the
    * task binary once, never as per-shard literals) — else the composed
    * when-chain fallback. Flag-equal under a filter (spec-asserted
    * bitwise on non-null probes; a null probe is null vs false — both
    * drop in the filter).
    */
  def shardedBloomProbe(spark: org.apache.spark.sql.SparkSession,
                        filters: Array[Array[Byte]],
                        probeVal: Column): Column =
    if (spark.catalog.functionExists("bloom_contains_sharded"))
      call_function("bloom_contains_sharded",
        typedlit(filters.toSeq), probeVal)
    else shardedBloomProbeWhenChain(filters, probeVal)

  /** The composed fallback (the form the r8 gate ran): Spark's
    * `BloomFilterMightContain` requires a CONSTANT filter argument, so
    * without the native the dispatch is a when-chain over the nShards
    * constant filters — per row a walk of integer compares + exactly
    * one Bloom probe (still map-side), but the plan carries every
    * shard's ≤8 MB bytes as a separate literal and the walk is
    * O(nShards): fine at tens of shards, not at the production
    * ⌈n/5e7⌉ hundreds. Kept for extension-free sessions and as the
    * native's spec equality baseline. An empty (null-filter) shard
    * means definite-new.
    */
  def shardedBloomProbeWhenChain(filters: Array[Array[Byte]],
                                 probeVal: Column): Column = {
    val shard = pmod(probeVal, lit(filters.length.toLong)).cast("int")
    val populated = filters.zipWithIndex.filter(_._1 != null)
    if (populated.isEmpty) lit(false)
    else populated.tail.foldLeft(
      when(shard === populated.head._2,
        call_function("bloom_contains", lit(populated.head._1), probeVal))) {
      case (acc, (bytes, s)) => acc.when(shard === s,
        call_function("bloom_contains", lit(bytes), probeVal))
    }.otherwise(lit(false))
  }

  /** Core Bloom build over an arbitrary LONG value column — one sizing
    * rule (optimal bits at `fpp`, 64 Mbit cap, 64-bit floor) for every
    * Bloom user (the content-hash screen above, the streaming
    * decontamination screen's gram fingerprints). None in an
    * extension-free session; callers fall back to the exact path.
    */
  def buildBloomOver(df: DataFrame, value: org.apache.spark.sql.Column,
                     fpp: Double = 0.01,
                     numBits: Option[Long] = None): Option[Array[Byte]] = {
    val spark = df.sparkSession
    if (!spark.catalog.functionExists("bloom_build")) None
    else {
      val n = math.max(1L, df.count())
      val bits = numBits.getOrElse {
        val optimal = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
        math.min(67108864L, math.max(64L, optimal))
      }
      Some(df
        .agg(call_function("bloom_build", value, lit(n), lit(bits)).as("bf"))
        .head().getAs[Array[Byte]]("bf"))
    }
  }

  /** Exact-duplicate screen of `incoming` against the index with a
    * broadcast Bloom pre-filter: probe first (map-side, no shuffle),
    * verify only the maybes against the real hash set (removing the
    * ~fpp false positives), flag every incoming doc. The pre-filter is
    * invisible in the result BY CONSTRUCTION — the oracle is the plain
    * membership semantics, and the gate proves the fp-verify restores
    * exactness. `numBits` is a test hook (a saturated tiny filter forces
    * false positives); production uses the fpp-derived size. `nShards`
    * > 1 takes the [[buildBloomSharded]] past-the-cap path: each row
    * probes ONLY its own hash-prefix shard's filter via
    * [[shardedBloomProbe]] (native `bloom_contains_sharded`: one
    * reference-object node, O(1) dispatch and O(1) plan size in
    * nShards — still map-side), with an empty shard meaning
    * definite-new.
    *
    * Crossover rule, EXECUTABLE (was an operating-rule comment through
    * r9): any broadcast membership screen ships the WHOLE filter set to
    * every executor — at production sizing (⌈n/5e7⌉ shards × ≤8 MB)
    * that is ~1.6 GB of task-binary bytes by ~200 shards / ~1e10 docs,
    * past which the pre-filter costs more than it saves and the right
    * screen is the exact bucketed semi-join the verify step already is.
    * `maxBloomShards` (default 200, the ⌈1e10/5e7⌉ point) encodes it:
    * past the threshold NO filter is built or broadcast and the
    * semi-join alone screens — same output by construction (the
    * pre-filter is result-invisible), selection spec-pinned at both
    * regimes.
    */
  def exactScreenBloom(hashesIn: DataFrame, incoming: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       fpp: Double = 0.01,
                       numBits: Option[Long] = None,
                       nShards: Int = 1,
                       maxBloomShards: Int = 200): DataFrame = {
    // materialize the hash set once WHEN THE BLOOM PATH CONSUMES IT
    // THREE TIMES (count job, bloom-agg job, verify join) — in
    // production this frame is the loaded index table and the cut is
    // free. Past the crossover the semi-join reads it exactly ONCE, so
    // cutting would be a full extra materialization of the index
    // (~500 GB at 1e10 docs) for nothing — skip it there.
    val useBloom = nShards <= maxBloomShards
    val hashes = if (useBloom) hashesIn.cutLineage() else hashesIn
    val hashed = incoming.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val probeVal = xxhash64(col("content_hash"))
    val screened: Option[DataFrame] =
      if (!useBloom) None // past the broadcast ceiling: build nothing,
        // ship nothing, cut nothing — the exact bucketed semi-join
        // below IS the screen (the documented ≳1e10-doc crossover)
      else if (nShards > 1)
        buildBloomSharded(hashes, nShards, fpp, numBits).map { filters =>
          hashed.filter(
            shardedBloomProbe(hashesIn.sparkSession, filters, probeVal))
        }
      else
        buildBloom(hashes, fpp, numBits).map { bytes =>
          hashed.filter(call_function("bloom_contains", lit(bytes), probeVal))
        }
    val maybes = screened.getOrElse(hashed)
    val confirmed = maybes.join(hashes, Seq("content_hash"), "left_semi")
      .select(col(idCol)).withColumn("is_dup_exact", lit(1))
    incoming.select(col(idCol))
      .join(confirmed, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("is_dup_exact"), lit(0)).as("is_dup_exact"))
  }

  /** DuckDB oracle for [[exactScreenBloom]] as gated: plain membership —
    * the Bloom pre-filter must not change a single flag. The gate's
    * incoming batch is the 20% hash-split resubmitted against the FULL
    * corpus with every odd doc_id's text salted, so BOTH flag classes
    * exist at every scale factor (the raw corpora contain no exact
    * duplicates at all — screening disjoint splits would gate a
    * constant-zero column, i.e. nothing).
    */
  def bloomScreenSql(table: String = "documents", idCol: String = "doc_id",
                     textCol: String = "text", splitCaseSql: String): String =
    s"""WITH incoming AS (
      SELECT $idCol,
             CASE WHEN $idCol % 2 = 0 THEN $textCol
                  ELSE $textCol || ' resubmission salt' END AS $textCol
      FROM $table WHERE $splitCaseSql = 'incoming'
    )
    SELECT $idCol,
           CASE WHEN md5($textCol) IN (SELECT md5($textCol) FROM $table)
                THEN 1 ELSE 0 END AS is_dup_exact
    FROM incoming"""

  /** Screen a SEQUENCE of batches against an evolving corpus — the full
    * index-maintenance loop: each batch is screened via
    * [[incrementalFromIndex]], its kept docs are folded into the index
    * ([[mergeIndex]]) and the verify corpus, and the next batch sees
    * them. A batch-2 doc duplicating a batch-1 KEPT doc is flagged; one
    * duplicating a batch-1 REJECTED doc is not (the reject never entered
    * the corpus — its original is already there and screens it instead).
    * Output: one row per batch doc, tagged with the batch label.
    *
    * Materialization discipline (this is where the loop's cost lives):
    * each batch's flags are cut once (localCheckpoint) — they feed the
    * output AND the kept-set that grows the index, and without the cut
    * screen N's plan would re-derive every earlier screen. The INDEX is
    * cut at every version too, and each batch's banded signatures are
    * derived ONCE and shared between its screen and its merge (the
    * kept rows are a filter of them) — so every doc's MinHash is
    * computed exactly once across the whole loop, the "build cost is
    * paid once per doc, ever" contract. Before this, the un-cut corpus
    * signatures sat in BOTH screens' plans and the merge re-shingled
    * the kept docs from raw text: ~2.5× the dominant cost, and the
    * accumulated lineage re-ran under memory pressure (observed 6.5 →
    * 19.6 s swings at sf0.1).
    */
  def incrementalLoop(corpus: DataFrame, batches: Seq[(String, DataFrame)],
                      idCol: String = "doc_id", textCol: String = "text",
                      k: Int = 3, threshold: Double = 0.5,
                      digits: Int = 4,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    // fail the misuse BEFORE paying the (potentially large) index
    // build below — incrementalLoopFrom re-checks for its own callers
    require(batches.nonEmpty, "incrementalLoop needs at least one batch")
    val corp = corpus.select(col(idCol), col(textCol))
    val built = buildIndex(corp, idCol, textCol)
    incrementalLoopFrom(corp,
      DedupIndex(built.hashes.cutLineage(),
        built.bands.cutLineage()),
      batches, idCol, textCol, k, threshold, digits, maxBucket)
  }

  /** [[incrementalLoop]] starting from an ALREADY-BUILT (and
    * materialized) index over `corpus` — the production shape, where
    * the index is loaded from its store rather than rebuilt in-query.
    * The initial index's resident blocks are released once its merged
    * successor materializes (same discipline as every loop-internal
    * version), so pass per-call checkpoints, not a shared cache.
    */
  private def cutIdx(i: DedupIndex) =
    DedupIndex(i.hashes.cutLineage(), i.bands.cutLineage())
  /** Drop a localCheckpointed frame's resident blocks: the checkpoint
    * RDD sits behind a LogicalRDD leaf in the returned frame's plan.
    * Without this, a long-running loop (many batches) accumulates every
    * superseded index version's blocks in executor storage for the
    * whole query — the harness only clears them after the query ends.
    */
  private def dropCut(dfs: DataFrame*): Unit = dfs.foreach { d =>
    d.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** ONE crawl-cycle step of the index-maintenance loop: screen `batch`
    * against (`corp`, `idx`), merge the kept docs' hash/band rows into
    * the index. Returns (flags, kept, merged index) — flags and the
    * merged index are MATERIALIZED (cutLineage), and the superseded
    * `idx`'s blocks are NOT released here (the caller owns its version
    * chain — it may still be screening with it elsewhere); callers
    * release via their own discipline (see [[incrementalLoopFrom]] and
    * the streaming twin in graft.streaming.Streams). Factored out so
    * the BATCH loop and the STREAMING foreachBatch ingest run the
    * byte-identical step — the merge==rebuild oracle then gates both.
    */
  def incrementalStep(corp: DataFrame, idx: DedupIndex, batch: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      k: Int = 3, threshold: Double = 0.5,
                      digits: Int = 4,
                      maxBucket: Int = Int.MaxValue)
      : (DataFrame, DataFrame, DedupIndex) = {
    val bands = MinHashSpec.bandedSignatures(batch, idCol, textCol)
      .cutLineage()
    // emitHash: the screen's flags carry the kept docs' content hashes
    // (hidden trailing column — the step's callers drop it at emit), so
    // the hash half of the merge below reads the MATERIALIZED flags
    // instead of re-scanning + re-hashing the batch (r15; same values —
    // mergeIndex's md5-over-kept-docs, already computed on the spine)
    val flags = incrementalFromIndex(corp, idx, batch, idCol, textCol,
      k, threshold, digits, incomingBands = Some(bands),
      maxBucket = maxBucket, emitHash = true).cutLineage()
    val keptIds = flags.filter(col("kept") === 1).select(col(idCol))
    val kept = batch.select(col(idCol), col(textCol))
      .join(keptIds, Seq(idCol), "left_semi")
    // inlined mergeIndex with both halves sourced from already-
    // materialized frames: hashes from the flags' carried md5 (the
    // same union+distinct — distinct still collapses within-batch
    // duplicate content), bands from the batch signatures the screen
    // derived (mergeIndex's keptBands path, verbatim)
    val merged = cutIdx(DedupIndex(
      idx.hashes.union(flags.filter(col("kept") === 1)
        .select(col("__content_hash").as("content_hash"))).distinct(),
      idx.bands.union(bands.join(keptIds.select(col(idCol).as("id")),
        Seq("id"), "left_semi"))))
    // the merged successor is materialized (cutIdx is eager), so this
    // batch's band blocks are dead — both consumers (screen, merge) ran
    dropCut(bands)
    (flags, kept, merged)
  }

  /** Release a superseded index version's resident blocks (no-op for
    * scan-backed frames — e.g. the initial bucketed-table index, whose
    * "blocks" are the parquet files). Public for the streaming ingest
    * runner, which owns its own version chain across micro-batches.
    */
  def releaseIndex(i: DedupIndex): Unit = dropCut(i.hashes, i.bands)

  def incrementalLoopFrom(corpus: DataFrame, index: DedupIndex,
                          batches: Seq[(String, DataFrame)],
                          idCol: String = "doc_id", textCol: String = "text",
                          k: Int = 3, threshold: Double = 0.5,
                          digits: Int = 4,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    require(batches.nonEmpty, "incrementalLoop needs at least one batch")
    var corp = corpus.select(col(idCol), col(textCol))
    var idx = index
    val out = batches.zipWithIndex.map { case ((tag, batch), i) =>
      val flags =
        if (i == batches.size - 1) {
          // FINAL batch: nothing downstream consumes the merged index or
          // the kept docs — a bounded run's last screen is screen-ONLY.
          // Skipping the merge (and the step's eager flags/bands cuts,
          // each of which is a multi-stage Spark job of its own) removes
          // ~a third of the loop's job count; the emitted flags are the
          // identical incrementalFromIndex computation, so the
          // rebuild-from-scratch oracle is unaffected. A production loop
          // that KEEPS its index across runs calls incrementalStep per
          // batch instead (the streaming ingest does exactly that).
          incrementalFromIndex(corp, idx, batch, idCol, textCol,
            k, threshold, digits, maxBucket = maxBucket)
        } else {
          val (f, kept, merged) = incrementalStep(corp, idx, batch,
            idCol, textCol, k, threshold, digits, maxBucket)
          // the superseded index version's blocks are dead once its
          // merged successor materializes — every consumer already ran
          dropCut(idx.hashes, idx.bands)
          idx = merged
          corp = corp.union(kept)
          f
        }
      // the step's flags carry the hidden merge-hash column; the final
      // batch's screen-only flags don't — drop is a no-op there
      flags.drop("__content_hash").withColumn("batch", lit(tag))
    }.reduce(_.union(_))
    // Superseded index versions were released inside the loop. The LAST
    // surviving version must stay resident: the final batch's screen is
    // lazy and still references its blocks (a localCheckpoint cannot
    // recompute after unpersist). One version's residency is the loop's
    // documented steady-state footprint; the harness (and any caller's
    // session hygiene) reclaims it after the query runs.
    out
  }

  /** Shingle-containment pairs — the ASYMMETRIC near-dup detector:
    * C(A,B) = |S(A)∩S(B)| / min(|S(A)|,|S(B)|) flags a small document
    * largely CONTAINED in a big one (quotes, boilerplate inclusion,
    * page-in-crawl-of-site), which Jaccard-based dedup structurally
    * misses — a 100-shingle doc inside a 10,000-shingle doc has
    * Jaccard ≤ 0.01 (MinHash-LSH proposes nothing) but containment 1.0.
    *
    * Blocking is therefore the shingle inverted index itself, with the
    * scale lever containment actually uses at 100 TB: shingles
    * occurring in more than `maxDf` documents are dropped BEFORE the
    * pair join (stop-shingle removal — boilerplate shingles are
    * precisely the ones whose postings lists explode, and capping df
    * bounds the join at Σ min(df, maxDf)² per shingle). The cap is part
    * of the operator contract (both engines apply it), so results stay
    * oracle-exact; sizes are counted over the SAME capped shingle sets
    * for a consistent estimator.
    */
  def containment(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", blockCol: String = "lang",
                  k: Int = 3, threshold: Double = 0.6, maxDf: Int = 100,
                  digits: Int = 4): DataFrame = {
    val raw = shingledWords(df, idCol, textCol, blockCol, k)
    // one (blk, w) exchange of the exploded table, shared via
    // ReuseExchange by the semi-join probe under sizes AND both
    // self-join sides; the df-cap aggregate reads the raw frame, so its
    // shuffle is the vocab-sized partial aggregate (and its semi-join
    // side arrives already partitioned on the join key)
    val words = raw.repartition(col("blk"), col("w"))
    val rare = raw.groupBy(col("blk"), col("w"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("blk"), col("w"))
    val capped = words.join(rare, Seq("blk", "w"), "left_semi")
    val sizes = capped.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val a = capped.select(col("blk"), col("id").as("id_a"), col("w"))
    val b = capped.select(col("blk"), col("id").as("id_b"), col("w"))
    val inter = a.join(b, Seq("blk", "w"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("containment",
        round(col("n_common") / least(col("n_a"), col("n_b")), digits))
      .filter(col("containment") >= threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("containment"))
  }

  /** DuckDB oracle for [[containment]] — identical shingle sets, df cap,
    * and min-denominator arithmetic.
    */
  def containmentSql(table: String = "documents", idCol: String = "doc_id",
                     textCol: String = "text", blockCol: String = "lang",
                     k: Int = 3, threshold: Double = 0.6,
                     maxDf: Int = 100): String =
    s"""WITH words AS (
         SELECT $idCol AS id, $blockCol AS blk,
                unnest(${Text.shingleSql(textCol, k)}) AS w
         FROM $table),
       rare AS (
         SELECT blk, w FROM words GROUP BY blk, w
         HAVING count(*) <= $maxDf),
       capped AS (
         SELECT words.* FROM words SEMI JOIN rare USING (blk, w)),
       sizes AS (
         SELECT id, count(*) AS n_sh FROM capped GROUP BY id),
       inter AS (
         SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         FROM capped a JOIN capped b ON a.blk = b.blk AND a.w = b.w
           AND a.id < b.id
         GROUP BY a.id, b.id)
     SELECT id_a AS doc_a, id_b AS doc_b,
            round(n_common / cast(least(sa.n_sh, sb.n_sh) as double), 4)
              AS containment
     FROM inter
     JOIN sizes sa ON id_a = sa.id
     JOIN sizes sb ON id_b = sb.id
     WHERE round(n_common / cast(least(sa.n_sh, sb.n_sh) as double), 4)
       >= $threshold"""

  /** Rounds the most recent [[connectedComponents]] call took to
    * converge — driver-side diagnostic only (read it right after the
    * call; ScaleCheck prints it as scale evidence for the O(log
    * diameter) claim).
    */
  @volatile var lastCcRounds: Int = 0

  /** Connected components over an undirected duplicate-pair list: every
    * node gets the MINIMUM id reachable through any chain of pairs — the
    * canonical representative of its duplicate cluster. This is what turns
    * verified near-dup PAIRS into CLUSTERS when the keep policy needs a
    * canonical doc per group (pair-drop alone is enough only for
    * remove-all-but-min policies on cliques; chains A~B~C with no A~C pair
    * need the transitive closure).
    *
    * Distributed min-label propagation with pointer jumping: each round
    * (1) pulls the min label across edges, (2) shortcuts lbl := lbl(lbl),
    * so label information travels 2^r hops after r rounds — O(log
    * diameter) rounds for chain-shaped clusters, not O(diameter). State is
    * one (id, lbl) row per node; each round is two shuffled joins.
    * A LAZY `localCheckpoint` truncates lineage between rounds (iterative
    * DataFrame algorithms otherwise compound the plan exponentially); the
    * convergence aggregate is the single action that materializes it, so
    * each round is one job.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxRounds: Int = 50): DataFrame = {
    // Materialize the (possibly expensive — e.g. an LSH propose-verify
    // pipeline) pair frame ONCE before mirroring it: union'ing two selects
    // of the raw frame would compute the upstream pipeline twice.
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .cutLineage()
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).cutLineage()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // (1) min label over incoming neighbors
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("nmin"))
      // `old` (the label BEFORE this round) rides along so convergence
      // detection sees pull-step changes too, not just jump-step ones.
      val pulled = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      // (2) pointer jump: follow one indirection — lbl(v) := lbl(lbl(v)).
      // Every label IS a node id (labels only ever take node-id values),
      // so the inner join always finds its target. The OLD label rides the
      // jump as `chg`, so convergence needs no join back to `labels`.
      val jumped = pulled.as("p")
        .join(pulled.select(col("id").as("lbl"), col("lbl").as("lbl2")).as("t"),
          Seq("lbl"))
        .select(col("id"), col("lbl2").as("lbl"),
          (col("lbl2") =!= col("old")).cast("long").as("chg"))
      // LAZY localCheckpoint: the convergence aggregate below is the
      // action that materializes it, so each round is ONE job (the r4
      // eager-checkpoint + join-and-count shape was two jobs, the second
      // with its own shuffle). Lineage is still truncated.
      val next = jumped.cutLineageLazy()
      // coalesce: sum over an EMPTY frame is null (no pairs at all —
      // the r4 join-and-count shape returned 0 there)
      changed = next.agg(coalesce(sum(col("chg")), lit(0L)))
        .first().getLong(0)
      labels = next.select(col("id"), col("lbl"))
      round += 1
    }
    lastCcRounds = round
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Quality-aware SURVIVOR SELECTION: label every doc with its near-dup
    * cluster ([[jaccardOnCandidates]] propose-verify pairs →
    * [[connectedComponents]]), score every doc with the library's
    * composite quality score, and keep the BEST-quality member of each
    * cluster (ties → lowest id; singletons keep themselves). This is the
    * curation rule real pipelines use — "of these near-duplicates, keep
    * the cleanest copy" — where [[cleanCorpus]]'s keep-min-id is the
    * arbitrary-but-deterministic baseline.
    *
    * Output: one row per cluster (cluster, keep_doc_id, quality_score,
    * n_docs). Scale shape: the pair family's labeled blocking bounds the
    * cluster work; scoring is one scan; survivor selection is a single
    * partial-aggregated `max(struct(score, −id))` per cluster — one
    * shuffle of (cluster, score, id) triples, never the texts.
    */
  def keepBest(docs: DataFrame, threshold: Double = 0.5,
               idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val pairs = jaccardOnCandidates(docs, idCol, textCol,
      threshold = threshold)
    val cc = connectedComponents(pairs)
    val scored = Text.quality(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("quality_score"))
    val labeled = scored.join(cc, scored(idCol) === cc("id"), "left")
      .select(scored(idCol).as("__id"),
        coalesce(cc("cluster"), scored(idCol)).as("cluster"),
        col("quality_score"))
    labeled.groupBy(col("cluster"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        max(struct(col("quality_score"), (-col("__id")).as("__negid"),
          col("__id").as("__id"))).as("__best"))
      .select(col("cluster"), col("__best.__id").as("keep_doc_id"),
        col("__best.quality_score").as("quality_score"), col("n_docs"))
  }

  /** DuckDB oracle for [[keepBest]]: the recursive-CTE transitive
    * closure over the same propose-verify pairs, the exact
    * [[Text.qualityScoreSql]] composite, and (score DESC, id ASC)
    * survivor selection.
    */
  def keepBestSql(table: String = "documents", idCol: String = "doc_id",
                  textCol: String = "text",
                  threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (
         ${MinHashSpec.duckdbJaccardSql(table, idCol, textCol, threshold)}
       ),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION ALL
         SELECT doc_b AS src, doc_a AS dst FROM pairs
       ),
       walk AS (
         SELECT DISTINCT src AS id, src AS lbl FROM edges
         UNION
         SELECT e.dst AS id, w.lbl AS lbl
         FROM walk w JOIN edges e ON e.src = w.id
       ),
       cc AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY 1),
       q AS (${Text.qualityScoreSql(table, idCol, textCol)}),
       j AS (
         SELECT coalesce(cc.cluster, q.$idCol) AS cluster, q.$idCol AS id,
                q.quality_score
         FROM q LEFT JOIN cc ON q.$idCol = cc.id),
       r AS (
         SELECT cluster, id, quality_score,
                row_number() OVER (PARTITION BY cluster
                  ORDER BY quality_score DESC, id) AS rn,
                count(*) OVER (PARTITION BY cluster) AS n_docs
         FROM j)
       SELECT cluster, id AS keep_doc_id, quality_score,
              cast(n_docs as int) AS n_docs
       FROM r WHERE rn = 1"""

  /** Span-level exact dedup (the C4 recipe, reference: "Exploring the
    * Limits of Transfer Learning" §2.2's three-sentence-span dedup,
    * adapted to token windows): the corpus is cut into NON-overlapping
    * `window`-token spans; every span whose exact text occurred earlier
    * in the corpus (first occurrence = minimum (doc, span index)) is
    * dropped, and each document is re-assembled from its surviving
    * spans. Catches the long-tail of cross-document boilerplate that
    * document-level dedup (exact or MinHash) cannot remove without
    * dropping whole documents.
    *
    * Scale shape: one scan, one explode to ~n_tokens/window span rows,
    * first-occurrence decided by a window rank over the span's md5 (a
    * bounded 32-char shuffle key regardless of `window` — the span TEXT
    * never keys a shuffle), one groupBy(doc) to re-assemble. Short final
    * spans (< window tokens) are never dedup candidates — they get a
    * per-instance key so the rank shuffle has no null-key skew.
    */
  def spanDedup(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", window: Int = 10): DataFrame = {
    val keyed = spanSegments(df, idCol, textCol, window)
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol), col("seg"))
    val marked = keyed.withColumn("kept",
      (row_number().over(byContent) === 1).cast("int"))
    reassemble(marked, idCol)
  }

  /** Non-overlapping `window`-token spans of each document, keyed for a
    * content shuffle: full spans by md5(text) (bounded 32-char key);
    * partial tail spans by a unique per-instance key, so they are kept
    * by construction and never form a skewed null/constant partition.
    * Shared segmentation of [[spanDedup]] and [[boilerplateDedup]].
    */
  private def spanSegments(df: DataFrame, idCol: String, textCol: String,
                           window: Int): DataFrame = {
    val w = window
    // NULL text coalesces to '' (one partial span, kept by
    // construction): split(NULL) explodes to ZERO span rows, which
    // would silently drop the doc from the reassembled corpus — the
    // same row-loss class [[exact]]'s null contract closes. A null doc
    // thus behaves exactly like an empty one: n_spans=1, clean_text ''.
    df.withColumn("__toks", split(coalesce(col(textCol), lit("")), " "))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, (size(__toks) - 1) div $w),
              i -> struct(array_join(slice(__toks, i * $w + 1, $w), ' ')
                            AS seg_text,
                          size(slice(__toks, i * $w + 1, $w)) AS seg_len))""")))
      .select(col(idCol), col("pos").as("seg"),
        col("col.seg_text").as("seg_text"), col("col.seg_len").as("seg_len"))
      .withColumn("__h",
        when(col("seg_len") === w, md5(col("seg_text")))
          .otherwise(concat(lit("p:"), col(idCol), lit(":"), col("seg"))))
  }

  /** Re-assemble each document from its `kept`-marked spans, in span
    * order, with the span ledger (total vs kept counts).
    */
  private def reassemble(marked: DataFrame, idCol: String): DataFrame =
    marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("kept")).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("kept") === 1, struct(col("seg"), col("seg_text"))))),
          x => x("seg_text")), " ").as("clean_text"))
      .select(col(idCol), col("n_spans"), col("n_kept"), col("clean_text"))

  /** Boilerplate (df-threshold) span removal — the CCNet / RefinedWeb
    * line-dedup recipe adapted to token spans: a full span whose text
    * occurs in MORE THAN `maxDf` distinct documents is boilerplate and
    * is dropped from EVERY document — including the first occurrence,
    * which is what separates this from [[spanDedup]] (first-occurrence
    * keep): headers, navigation chrome and license blocks carry no
    * signal anywhere, so no copy survives. Rare spans (df <= maxDf) are
    * kept in all their documents; partial tail spans are never
    * candidates.
    *
    * Scale shape: TWO corpus scans by design — the span inventory is
    * derived once for the distinct-doc count per span hash (bounded md5
    * key, partial-combined) and re-derived for the removal join, rather
    * than materialized: the exploded span table is larger than the
    * source corpus, so at scale recomputing a scan+explode is the cheap
    * side of that trade. The df filter runs before the join, so the
    * join's right side is ONLY the (small) set of spans repeating
    * across >maxDf documents, not the full span inventory — AQE
    * broadcasts it when it fits. One groupBy(doc) to re-assemble.
    */
  def boilerplateDedup(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", window: Int = 10,
                       maxDf: Int = 2): DataFrame = {
    val keyed = spanSegments(df, idCol, textCol, window)
    val boiler = keyed.filter(col("seg_len") === window)
      .groupBy(col("__h"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"), lit(1).as("__is_boiler"))
    val marked = keyed.join(boiler, Seq("__h"), "left")
      .withColumn("kept", col("__is_boiler").isNull.cast("int"))
    reassemble(marked, idCol)
  }

  /** DuckDB oracle mirroring [[boilerplateDedup]] exactly (distinct-doc
    * count per full-span text; spans over the threshold dropped
    * everywhere; partial tails always kept).
    */
  def boilerplateDedupSql(table: String = "documents",
                          idCol: String = "doc_id", textCol: String = "text",
                          window: Int = 10, maxDf: Int = 2): String = {
    val w = window
    s"""WITH ${segsCteSql(table, idCol, textCol, w)}, boiler AS (
      SELECT seg_text FROM segs WHERE seg_len = $w
      GROUP BY seg_text HAVING count(DISTINCT $idCol) > $maxDf
    ), marked AS (
      SELECT s.$idCol, s.seg, s.seg_text,
             CASE WHEN s.seg_len < $w THEN 1
                  WHEN b.seg_text IS NULL THEN 1 ELSE 0 END AS kept
      FROM segs s LEFT JOIN boiler b
        ON s.seg_len = $w AND s.seg_text = b.seg_text
    )
    ${reassembleSql(idCol)}"""
  }

  /** The `segs` CTE shared by [[spanDedupSql]] and
    * [[boilerplateDedupSql]] — one definition of the span slicing, so
    * the two oracles cannot drift apart on segmentation (the SQL twin
    * of [[spanSegments]]).
    */
  private def segsCteSql(table: String, idCol: String, textCol: String,
                         w: Int): String =
    s"""segs AS (
      SELECT $idCol, u.i AS seg,
             array_to_string(ts[u.i * $w + 1 : u.i * $w + $w], ' ') AS seg_text,
             len(ts[u.i * $w + 1 : u.i * $w + $w]) AS seg_len
      FROM (SELECT $idCol, string_split(coalesce($textCol, ''), ' ') AS ts
            FROM $table),
           LATERAL (SELECT unnest(generate_series(0, (len(ts) - 1) // $w)) AS i) u
    )"""

  /** The final re-assembly SELECT over a `marked` CTE — the SQL twin of
    * [[reassemble]], shared for the same no-drift reason.
    */
  private def reassembleSql(idCol: String): String =
    s"""SELECT $idCol,
           cast(count(*) as bigint) AS n_spans,
           cast(sum(kept) as bigint) AS n_kept,
           coalesce(string_agg(CASE WHEN kept = 1 THEN seg_text END,
                               ' ' ORDER BY seg), '') AS clean_text
    FROM marked GROUP BY $idCol"""

  /** DuckDB oracle mirroring [[spanDedup]] exactly (first occurrence by
    * (doc, span index) via a rank over the span text; partial tail spans
    * always kept; re-assembly ordered by span index).
    */
  def spanDedupSql(table: String = "documents", idCol: String = "doc_id",
                   textCol: String = "text", window: Int = 10): String = {
    val w = window
    s"""WITH ${segsCteSql(table, idCol, textCol, w)}, marked AS (
      SELECT $idCol, seg, seg_text,
             CASE WHEN seg_len < $w THEN 1
                  WHEN row_number() OVER (PARTITION BY seg_text
                                          ORDER BY $idCol, seg) = 1 THEN 1
                  ELSE 0 END AS kept
      FROM segs
    )
    ${reassembleSql(idCol)}"""
  }
}

/** MinHash + LSH specification shared by the Spark implementation and the
  * DuckDB oracle — both are generated from the same constants so the two
  * engines compute bit-identical signatures.
  *
  * Hash: H(w) = little-endian u64 of the LOWER 8 bytes of md5(w)
  * (DuckDB's `md5_number_lower`), reduced mod P = 2^31-1. Permutation i:
  * h_i(x) = (a_i * x + b_i) mod P. Signature = K minima over the
  * document's distinct tokens; LSH groups signatures into BANDS bands of
  * ROWS values; docs sharing any full band are candidate pairs.
  */
object MinHashSpec {
  val P: Long = 2147483647L // 2^31 - 1
  val K: Int = 16
  val BANDS: Int = 4
  val ROWS: Int = K / BANDS

  // Deterministic permutation constants (Knuth multiplicative step).
  val a: Seq[Long] = (0 until K).map(i => ((i + 1) * 2654435761L) % (P - 1) + 1)
  val b: Seq[Long] = (0 until K).map(i => ((i + 1) * 40503L * 65537L + 17) % P)

  /** 32-bit cross-engine hash of a string expression: little-endian read
    * of md5 bytes 12..15 == DuckDB's `md5_number_lower(x) >> 32`. Fits a
    * BIGINT in both engines, so bit arithmetic (SimHash, fingerprints)
    * mirrors exactly.
    */
  def sparkH32Expr(strExpr: String): String = {
    val pairs = (0 until 4).map(i => s"substring(md5($strExpr), ${31 - 2 * i}, 2)").mkString(", ")
    s"cast(conv(concat($pairs), 16, 10) as bigint)"
  }

  /** DuckDB twin of [[sparkH32Expr]]. */
  def duckH32Sql(strExpr: String): String =
    s"cast((md5_number_lower($strExpr) >> 32) as bigint)"

  /** H32 Spark SQL, preferring the native fused expression when the
    * session registered it (GraftFunctions) — same value either way.
    */
  def h32Expr(spark: org.apache.spark.sql.SparkSession, strExpr: String): String =
    if (spark.catalog.functionExists("md5_h32")) s"md5_h32($strExpr)"
    else sparkH32Expr(strExpr)

  /** H-mod-P Spark SQL over a raw token column, preferring the native
    * fused expression.
    */
  def hpExpr(spark: org.apache.spark.sql.SparkSession, tok: String): String =
    if (spark.catalog.functionExists("md5_mod_p")) s"md5_mod_p($tok)"
    else {
      val pairs = (0 until 8)
        .map(i => s"substring(md5($tok), ${31 - 2 * i}, 2)").mkString(", ")
      s"cast(cast(conv(concat($pairs), 16, 10) as decimal(20,0)) % $P as bigint)"
    }

  /** 62-bit cross-engine content fingerprint:
    * (H32 mod 2^31) * 2^32 + (H64 mod P), both md5-derived. Identical
    * strings share the fingerprint by design (content identity / replay
    * idempotence); distinct strings collide with birthday probability
    * ~n²/2^63 — negligible below billions per scope, where the 31-bit
    * [[hpExpr]] alone starts colliding at ~65k.
    */
  def fingerprint62Expr(spark: org.apache.spark.sql.SparkSession,
                        strExpr: String): String =
    // fused native form first: the composed spelling digests the string
    // TWICE, and inside a transform lambda (per-gram fingerprints)
    // subexpression elimination cannot merge the two md5 calls
    if (spark.catalog.functionExists("md5_fp62")) s"md5_fp62($strExpr)"
    else s"(${h32Expr(spark, strExpr)} % 2147483648L) * 4294967296L + ${hpExpr(spark, strExpr)}"

  /** DuckDB twin of [[fingerprint62Expr]] (UBIGINT arithmetic; the result
    * is < 2^63 so the final BIGINT cast cannot overflow).
    */
  def duckFingerprint62Sql(strExpr: String): String =
    s"cast(((md5_number_lower($strExpr) >> 32) % 2147483648) * 4294967296 " +
      s"+ (md5_number_lower($strExpr) % $P) as bigint)"

  /** Shingle width fed to the signatures (see [[Text.shingleExpr]]). */
  val SHINGLE_K: Int = 3

  /** Per-document K-column minhash signature over 3-token shingles.
    *
    * Fused-kernel form (when the session registered GraftFunctions,
    * which every entry point does): one scan-local `minhash_sig`
    * generator per row — NO shingle explode, NO groupBy shuffle. The
    * composed spelling this replaced (explode shingles → md5-mod-P →
    * K min aggregates) shuffled the exploded shingle frame, ~k× the
    * corpus text volume — the single largest shuffle of every near-dup
    * operator at 100 TB. `explode` of the 0-or-1-row signature array
    * drops degenerate docs (null/empty/whitespace-only text) exactly
    * like the empty shingle explode did, with no filter predicate for
    * pushdown to duplicate the interpreted chain into (the §8d/r10
    * stream_lsh lesson). Value equality with the composed spelling is
    * spec-pinned (FunctionsSourcesSpec); the composed form remains the
    * fallback for sessions without the extension, same contract.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    if (df.sparkSession.catalog.functionExists("minhash_sig")) {
      val one = df
        .select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
        .select(col(idCol), explode(expr("minhash_sig(__toks)")).as("__sigv"))
      one.select(col(idCol) +: (0 until K).map(i =>
        element_at(col("__sigv"), i + 1).as(s"mh_$i")): _*)
    } else {
      graft.functions.FallbackWarnings.warnOnce("minhash_sig-fallback",
        "MinHashSpec.signatures: session has no `minhash_sig` — falling " +
          "back to the composed shingle explode+groupBy, which SHUFFLES " +
          "the exploded shingle frame (~shingle-width × corpus text " +
          "volume; the largest near-dup shuffle at scale). Values are " +
          "identical; to get the scan-local fused kernel register the " +
          "extension: SparkSession.builder.withExtensions(" +
          "graft.functions.GraftFunctions.register)."): Unit
      val words = df
        .withColumn("__toks", Text.tokens(col(textCol)))
        .select(col(idCol),
          explode(expr(Text.shingleExpr("__toks", SHINGLE_K))).as("w"))
        .withColumn("__hp", expr(hpExpr(df.sparkSession, "w")))
      val aggs = (0 until K).map(i =>
        min(expr(s"(__hp * ${a(i)}L + ${b(i)}L) % $P")).as(s"mh_$i"))
      words.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Candidate near-dup pairs via banded LSH + estimated Jaccard
    * (fraction of equal signature positions). Shuffles: one groupBy for
    * signatures, one self-join keyed on (band, band-signature), one
    * distinct. The full K-value signature (~128 B) rides through the band
    * explode so the estimate is computed directly on the joined pair —
    * no joins back to the signature table. No cross product anywhere.
    *
    * `maxBucket` is the MEGA-CLUSTER guard: a crawl corpus carries the
    * same boilerplate page m times, every copy lands in the same band
    * buckets, and the self-join emits C(m,2) pairs per band — at
    * m = 10⁶ that is 5×10¹¹ rows from ONE page, the classic LSH scale
    * bomb. Buckets larger than `maxBucket` are dropped from candidate
    * generation (their members are near-identical en masse — exactly
    * the population exact/normalized dedup already collapses, which is
    * why [[Dedup.cleanCorpus]] runs the exact stage FIRST and proposes
    * on its survivors). Default keeps every bucket — plan and oracle
    * identical to the uncapped form; the cap adds one window count
    * keyed like the join, no extra scan of the corpus.
    */
  def candidatePairs(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", digits: Int = 4,
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    val banded = bandedSignatures(df, idCol, textCol)
    val bands =
      if (maxBucket == Int.MaxValue) banded
      else banded
        .withColumn("__bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bsig"))))
        .filter(col("__bn") <= maxBucket).drop("__bn")
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        round(expr("aggregate(zip_with(x.sigv, y.sigv, (p, q) -> IF(p = q, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / K, digits).as("est_jaccard"))
      .distinct()
  }

  /** Banded signature rows `(id, sigv, band, bsig)` for a frame — the
    * LSH bucket coordinates behind [[candidatePairs]] (self-join) and
    * [[Dedup.incremental]] (incoming-vs-corpus join). The signature
    * aggregate is materialized once (localCheckpoint, not cache: no
    * CacheManager entry left behind), then banded in one pass with the
    * band signatures posexploded from an array — not a BANDS-way union
    * re-scanning it.
    */
  def bandedSignatures(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val sig = signatures(df, idCol, textCol).cutLineage()
    val bandSigs = (0 until BANDS).map { j =>
      val cs = (j * ROWS until (j + 1) * ROWS).map(i => col(s"mh_$i"))
      concat_ws("_", cs: _*)
    }
    val sigArr = array((0 until K).map(i => col(s"mh_$i")): _*)
    sig.select(col(idCol).as("id"), sigArr.as("sigv"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "bsig")))
  }

  /** Shared CTE chain (tokens → hashes → signatures → bands → candidate
    * pairs) reused by [[duckdbSql]] and [[duckdbJaccardSql]].
    */
  def duckdbCandidateCtes(table: String, idCol: String,
                          textCol: String): String = {
    val mh = (0 until K).map(i =>
      s"min((h * ${a(i)} + ${b(i)}) % $P) AS mh_$i").mkString(",\n      ")
    val bandSelects = (0 until BANDS).map { j =>
      val cs = (j * ROWS until (j + 1) * ROWS).map(i => s"mh_$i").mkString(", ")
      s"SELECT $idCol AS id, $j AS band, concat_ws('_', $cs) AS bsig FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""WITH toks AS (
      SELECT $idCol, unnest(${graft.text.Text.shingleSql(textCol, SHINGLE_K)}) AS w
      FROM $table
    ), hashed AS (
      SELECT $idCol, CAST(md5_number_lower(w) % $P AS BIGINT) AS h FROM toks
    ), sig AS (
      SELECT $idCol,
      $mh
      FROM hashed GROUP BY $idCol
    ), bands AS (
      $bandSelects
    ), cand AS (
      SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bsig = y.bsig AND x.id < y.id
    )"""
  }

  /** DuckDB oracle for [[jaccardOnCandidates]]: the LSH candidate CTEs
    * plus an exact shingle-Jaccard verification restricted to those
    * pairs — the composed scale-path pipeline, cross-engine.
    */
  def duckdbJaccardSql(table: String = "documents", idCol: String = "doc_id",
                       textCol: String = "text",
                       threshold: Double = 0.5): String = {
    val jac = "round(nc / cast(sa.n_words + sb.n_words - nc as double), 4)"
    s"""${duckdbCandidateCtes(table, idCol, textCol)},
    sizes AS (SELECT $idCol AS id, count(*) AS n_words FROM toks GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN toks wa ON c.doc_a = wa.$idCol
      JOIN toks wb ON c.doc_b = wb.$idCol AND wa.w = wb.w
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, $jac AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.id
    JOIN sizes sb ON doc_b = sb.id
    WHERE $jac >= $threshold"""
  }

  /** DuckDB oracle mirroring [[candidatePairs]] exactly. */
  def duckdbSql(table: String = "documents", idCol: String = "doc_id",
                textCol: String = "text"): String = {
    val eqSum = (0 until K).map(i =>
      s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""${duckdbCandidateCtes(table, idCol, textCol)}
    SELECT cand.doc_a, cand.doc_b,
           round(($eqSum) / ${K}.0, 4) AS est_jaccard
    FROM cand
    JOIN sig sa ON cand.doc_a = sa.$idCol
    JOIN sig sb ON cand.doc_b = sb.$idCol"""
  }

  /** One side's tokens→hashes→signatures→bands CTE chain, suffixed so
    * [[duckdbIncrementalSql]] can instantiate it once per frame (the
    * incoming batch and the corpus). Same constants as
    * [[duckdbCandidateCtes]], so signatures stay bit-identical to the
    * Spark side.
    */
  private def duckdbSideCtes(src: String, sfx: String, idCol: String,
                             textCol: String): String = {
    val mh = (0 until K).map(i =>
      s"min((h * ${a(i)} + ${b(i)}) % $P) AS mh_$i").mkString(",\n      ")
    val bandSelects = (0 until BANDS).map { j =>
      val cs = (j * ROWS until (j + 1) * ROWS).map(i => s"mh_$i").mkString(", ")
      s"SELECT id, $j AS band, concat_ws('_', $cs) AS bsig FROM sig_$sfx"
    }.mkString("\n      UNION ALL ")
    s"""toks_$sfx AS (
      SELECT $idCol AS id, unnest(${graft.text.Text.shingleSql(textCol, SHINGLE_K)}) AS w
      FROM $src
    ), hashed_$sfx AS (
      SELECT id, CAST(md5_number_lower(w) % $P AS BIGINT) AS h FROM toks_$sfx
    ), sig_$sfx AS (
      SELECT id,
      $mh
      FROM hashed_$sfx GROUP BY id
    ), bands_$sfx AS (
      $bandSelects
    )"""
  }

  /** One full screen of `incomingSrc` against `corpusSrc` (exact md5
    * membership + banded-LSH propose → shingle-Jaccard verify), ending
    * in a `flags_$sfx` CTE with one row per incoming doc — the SQL twin
    * of [[Dedup.incrementalFromIndex]], suffixed so
    * [[duckdbIncrementalLoopSql]] can chain screens against evolving
    * corpora.
    */
  private def duckdbScreenCtes(corpusSrc: String, incomingSrc: String,
                               sfx: String, idCol: String, textCol: String,
                               threshold: Double): String = {
    val jac = "round(nc / cast(sa.n + sb.n - nc as double), 4)"
    s"""exact_dup_$sfx AS (
      SELECT $idCol AS id FROM $incomingSrc
      WHERE md5($textCol) IN (SELECT md5($textCol) FROM $corpusSrc)
    ), ${duckdbSideCtes(incomingSrc, s"i$sfx", idCol, textCol)},
    ${duckdbSideCtes(corpusSrc, s"c$sfx", idCol, textCol)},
    cand_$sfx AS (
      SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
      FROM bands_i$sfx x JOIN bands_c$sfx y
        ON x.band = y.band AND x.bsig = y.bsig
    ), sizes_i$sfx AS (SELECT id, count(*) AS n FROM toks_i$sfx GROUP BY 1),
    sizes_c$sfx AS (SELECT id, count(*) AS n FROM toks_c$sfx GROUP BY 1),
    inter_$sfx AS (
      SELECT cd.doc_a, cd.doc_b, count(*) AS nc
      FROM cand_$sfx cd
      JOIN toks_i$sfx wa ON cd.doc_a = wa.id
      JOIN toks_c$sfx wb ON cd.doc_b = wb.id AND wa.w = wb.w
      GROUP BY 1, 2
    ), near_dup_$sfx AS (
      SELECT DISTINCT i.doc_a AS id
      FROM inter_$sfx i
      JOIN sizes_i$sfx sa ON i.doc_a = sa.id
      JOIN sizes_c$sfx sb ON i.doc_b = sb.id
      WHERE $jac >= $threshold
    ), flags_$sfx AS (
      SELECT inc.$idCol,
             CASE WHEN e.id IS NOT NULL THEN 1 ELSE 0 END AS is_dup_exact,
             CASE WHEN n.id IS NOT NULL THEN 1 ELSE 0 END AS is_dup_near,
             CASE WHEN e.id IS NULL AND n.id IS NULL THEN 1 ELSE 0 END AS kept
      FROM $incomingSrc inc
      LEFT JOIN exact_dup_$sfx e ON inc.$idCol = e.id
      LEFT JOIN near_dup_$sfx n ON inc.$idCol = n.id
    )"""
  }

  /** DuckDB oracle for [[Dedup.incremental]]: the table is split into
    * corpus/incoming by `splitCaseSql` (the shared deterministic
    * hash-split CASE, [[graft.etl.Sampling.hashSplitSql]]), then the
    * incoming side is screened exactly (md5 membership) and nearly
    * (incoming bands × corpus bands → exact shingle Jaccard) against
    * the corpus only — never against itself — mirroring the Spark
    * operator flag for flag.
    */
  def duckdbIncrementalSql(table: String = "documents",
                           idCol: String = "doc_id", textCol: String = "text",
                           splitCaseSql: String, threshold: Double = 0.5): String =
    s"""WITH corpus AS (
      SELECT $idCol, $textCol FROM $table WHERE $splitCaseSql = 'corpus'
    ), incoming AS (
      SELECT $idCol, $textCol FROM $table WHERE $splitCaseSql = 'incoming'
    ), ${duckdbScreenCtes("corpus", "incoming", "0", idCol, textCol, threshold)}
    SELECT $idCol, is_dup_exact, is_dup_near, kept FROM flags_0"""

  /** DuckDB oracle for [[Dedup.incrementalLoop]] over two batches: the
    * second screen's corpus is re-derived FROM SCRATCH as
    * corpus ∪ batch-1-kept, while the Spark side MERGES the persisted
    * index — value equality across engines is what proves the merge
    * path equivalent to a rebuild.
    */
  def duckdbIncrementalLoopSql(table: String = "documents",
                               idCol: String = "doc_id", textCol: String = "text",
                               splitCaseSql: String,
                               threshold: Double = 0.5): String =
    s"""WITH corpus0 AS (
      SELECT $idCol, $textCol FROM $table WHERE $splitCaseSql = 'corpus'
    ), b1 AS (
      SELECT $idCol, $textCol FROM $table WHERE $splitCaseSql = 'b1'
    ), b2 AS (
      SELECT $idCol, $textCol FROM $table WHERE $splitCaseSql = 'b2'
    ), ${duckdbScreenCtes("corpus0", "b1", "1", idCol, textCol, threshold)},
    corpus1 AS (
      SELECT $idCol, $textCol FROM corpus0
      UNION ALL
      SELECT b.$idCol, b.$textCol FROM b1 b
      JOIN flags_1 f ON b.$idCol = f.$idCol AND f.kept = 1
    ), ${duckdbScreenCtes("corpus1", "b2", "2", idCol, textCol, threshold)}
    SELECT $idCol, 'b1' AS batch, is_dup_exact, is_dup_near, kept FROM flags_1
    UNION ALL
    SELECT $idCol, 'b2' AS batch, is_dup_exact, is_dup_near, kept FROM flags_2"""
}

/** SimHash: 32-bit fingerprint. Bit j of the fingerprint is the sign of
  * Σ_distinct-tokens (bit j of H32(token) ? +1 : -1), H32 being the
  * cross-engine md5-derived hash — so the DuckDB oracle reproduces the
  * fingerprint bit-for-bit. Near-dup candidates share one of 4 8-bit
  * bands (hamming-band blocking).
  */
object SimHash {
  val BITS = 32
  val BANDS = 4
  val BAND_BITS: Int = BITS / BANDS

  def fingerprints(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val words = df
      .withColumn("__toks", Text.tokens(col(textCol)))
      .select(col(idCol), explode(array_distinct(col("__toks"))).as("w"))
      .withColumn("__h", expr(MinHashSpec.h32Expr(df.sparkSession, "w")))
    val bitSums = (0 until BITS).map(j =>
      sum(when(expr(s"shiftright(__h, $j) & 1") === 1, 1).otherwise(-1)).as(s"__s_$j"))
    val agg = words.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until BITS).map(j =>
      when(col(s"__s_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val withSim = agg.select(col(idCol), sim.as("simhash"))
    val bandCols = (0 until BANDS).map(j =>
      expr(s"shiftright(simhash, ${j * BAND_BITS}) & ${(1L << BAND_BITS) - 1}")
        .as(s"band_$j"))
    withSim.select(col(idCol) +: col("simhash") +: bandCols: _*)
  }

  /** DuckDB oracle mirroring [[fingerprints]] exactly. */
  def duckdbSql(table: String = "documents", idCol: String = "doc_id",
                textCol: String = "text"): String = {
    val sums = (0 until BITS).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j")
      .mkString(",\n      ")
    val sim = (0 until BITS).map(j =>
      s"CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val bands = (0 until BANDS).map(j =>
      s"(simhash >> ${j * BAND_BITS}) & ${(1L << BAND_BITS) - 1} AS band_$j")
      .mkString(", ")
    s"""WITH toks AS (
      SELECT $idCol, unnest(list_distinct(string_split_regex(trim(lower($textCol)), '${Text.wsRe}'))) AS w
      FROM $table
    ), hashed AS (
      SELECT $idCol, ${MinHashSpec.duckH32Sql("w")} AS h FROM toks
    ), sums AS (
      SELECT $idCol,
      $sums
      FROM hashed GROUP BY $idCol
    ), sim AS (
      SELECT $idCol, cast($sim as bigint) AS simhash FROM sums
    )
    SELECT $idCol, simhash, $bands FROM sim"""
  }
}
