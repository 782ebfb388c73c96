package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det
import graft.functions.Det.r4

/** Text-analysis + deduplication operators over `documents` — the
  * training-data-pipeline surface: exact dedup, MinHash+LSH near-dup,
  * SimHash, n-gram Jaccard, token/TF-IDF analytics, quality scoring,
  * marker-based language ID, and fingerprinting.
  *
  * Scale design (100 TB of documents):
  *  - all hashing (md5-based minhash/simhash) happens per-row inside
  *    whole-stage codegen via higher-order functions — no UDFs, no
  *    driver-side state;
  *  - near-dup candidate generation goes through LSH band buckets, so
  *    the self-join is on (band, band_hash) — never the O(n²) cross
  *    join; the verify step only touches candidate pairs;
  *  - the shingle join for exact Jaccard keys on the shingle string;
  *    frequent-shingle skew at scale is bounded by first taking
  *    DISTINCT (doc, shingle) and would be salted/AQE-skew-split on a
  *    real cluster.
  */
object TextOps {

  private[graft] def docsWithToks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))

  /** Exact dedup under bag-of-words normalization: documents whose
    * sorted distinct-token set is identical form one dup group. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .withColumn("norm_hash",
        md5(expr("concat_ws(' ', array_sort(array_distinct(toks)))")))
      .groupBy($"norm_hash")
      .agg(min($"doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        expr("array_join(transform(array_sort(collect_set(doc_id)), x -> cast(x as string)), ',')")
          .as("members"))
      .orderBy($"keep_id")
  }

  /** Text normalization + canonical dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace; fingerprint the normalized
    * text and map every document to the minimum doc_id sharing its
    * fingerprint — the pre-pass that catches case/punctuation-only
    * duplicates before any fuzzy dedup runs. Pure per-row codegen
    * (lower/regexp_replace/md5) plus ONE hash-partitioned window by
    * fingerprint — no joins; at 100 TB the fingerprint groups are tiny,
    * so the window shuffle is skew-free. */
  def normalizeDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("norm",
        trim(regexp_replace(
          regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " ")))
      .select($"doc_id",
        md5($"norm").as("norm_md5"),
        size(split($"norm", " ")).cast("long").as("n_norm_tokens"))
      .withColumn("canonical_id",
        min($"doc_id").over(Window.partitionBy($"norm_md5")))
      .orderBy($"doc_id")
  }

  /** Corpus term frequencies: top-50 tokens with doc frequencies. */
  def topTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .select($"doc_id", explode($"toks").as("term"))
      .groupBy($"term")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("df"))
      .orderBy(desc("n"), $"term")
      .limit(50)
  }

  /** Per-language corpus stats. */
  def langStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        round(sum($"n_chars") / count(lit(1)).cast("double"), 2).as("avg_chars"),
        sum(size($"toks")).as("total_tokens"))
      .orderBy($"lang")
  }

  /** Per-document quality scoring: type-token ratio, stopword ratio,
    * average token length, length factor → composite score.
    *
    * Every output is a RATIONAL (integer counts over n_tokens) rounded
    * to 4 dp — so the rounding runs in exact integer arithmetic:
    * round(10⁴·num/den) half-up = (2·10⁴·num + den) div (2·den). A
    * double-then-round pipeline puts ties at the 5th decimal at the
    * mercy of each engine's last ulp (found at sf0.1: one doc rounded
    * 0.6588 in Spark vs 0.6587 in DuckDB); the integer form is the
    * mathematically-correct rounding and is identical in both engines
    * by construction. */
  /** Per-doc quality columns (incl. source), unordered — ONE definition
    * of the quality expression shared by d04's report and d34's capping
    * (mirroring the shared [[qualityCte]] on the oracle side). Pure map
    * work over the documents scan. */
  private def qualityBase(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("n_uniq", size(array_distinct($"toks")).cast("long"))
      .withColumn("n_stop",
        size(expr("filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in'))"))
          .cast("long"))
      // 0.4·u/n + 0.3·(1−s/n) + 0.3·min(1, n/100), over denominator n:
      // numerator = 0.4u + 0.3(n−s) + 0.3·min(100,n)/100·n, ×10⁴ →
      // (4000u + 3000(n−s) + 30·min(100,n)·n) / n
      .withColumn("quality",
        r4($"n_uniq" * 4000L + ($"n_tokens" - $"n_stop") * 3000L
            + least(lit(100L), $"n_tokens") * 30L * $"n_tokens",
          $"n_tokens" * 10000L))
  }

  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // exact half-up rounding of num/den to 4 dp, in integer space
    // (`div` = Spark's integral-divide function)
    qualityBase(spark, sfDir)
      .select(
        $"doc_id",
        $"n_tokens",
        $"n_uniq",
        r4($"n_uniq", $"n_tokens").as("ttr"),
        r4($"n_chars" - ($"n_tokens" - 1), $"n_tokens").as("avg_tok_len"),
        r4($"n_stop", $"n_tokens").as("stop_ratio"),
        $"quality")
      .orderBy($"doc_id")
  }

  // d31 denylist: sensitive terms masked as whole words. The fixture
  // vocabulary has no literal emails/phones, so the DICTIONARY face of
  // PII redaction is what is exercised — the regex plumbing (word
  // boundaries, global replace, match counting) is identical for
  // pattern-based PII; \b means the same thing to Java regex (Spark)
  // and RE2 (DuckDB) on this ASCII corpus.
  private val RedactPat = "\\b(customer|key|value)\\b"

  /** d31: denylist redaction — the PII-masking pass of a training-data
    * pipeline: every occurrence of a sensitive term is replaced with a
    * mask token, and each document reports its match count plus an md5
    * of the REDACTED text (so the oracle verifies the actual
    * replacement output, not just the counts).
    *
    * Scale: pure map work — one codegen'd projection per document, no
    * shuffle, no state; the ordering exchange is the declared-output
    * contract, not part of the operator. */
  def redact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(regexp_extract_all($"text", lit(RedactPat), lit(0)))
          .cast("long").as("n_masked"),
        md5(regexp_replace($"text", RedactPat, "<MASK>")).as("masked_md5"))
      .orderBy($"doc_id")
  }

  // d34 per-source token budget (binds at every fixture sf: each
  // source's corpus is well past 600 tokens)
  private val SourceCapTokens = 600L

  /** d34: per-source token caps — the data-mix curation op: within each
    * source, documents are admitted best-quality-first (d04's quality
    * score, doc_id tiebreak) until the source's token budget is spent;
    * every document reports its running total and keep/drop verdict.
    * This is how a 100 TB mix enforces "no source exceeds X tokens"
    * deterministically — no sampling RNG, reruns are identical.
    *
    * Scale: one hash exchange on source + one in-partition sort (the
    * window) — the quality columns ride the documents scan
    * ([[qualityBase]]), so there is NO join anywhere; token sums are
    * exact int64. The quality ordering key is the integer-rational r4 —
    * bit-identical in both engines, so the cut line cannot drift on a
    * float tie. */
  def sourceCaps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(desc("quality"), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qualityBase(spark, sfDir)
      .select($"doc_id", $"source", $"n_tokens", $"quality")
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .select($"doc_id", $"source", $"n_tokens", $"quality",
        $"cum_tokens",
        ($"cum_tokens" <= SourceCapTokens).as("kept"))
      .orderBy($"doc_id")
  }

  /** Document fingerprints: whole-text md5/sha256 + winnowing-style
    * min-shingle fingerprint (min md5 over 5-token shingles). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .select($"doc_id",
        md5($"text").as("md5_text"),
        sha2($"text", 256).as("sha256_text"),
        // guard: size(toks) < 5 would make sequence(0, size-5) descend
        // into bogus partial shingles; the oracle's empty range yields
        // NULL, so emit NULL for short documents on this side too
        expr("""CASE WHEN size(toks) >= 5 THEN
               array_min(transform(sequence(0, size(toks)-5),
               g -> md5(concat_ws(' ', toks[g], toks[g+1], toks[g+2], toks[g+3], toks[g+4]))))
               END""")
          .as("min_shingle_md5"))
      .orderBy($"doc_id")
  }

  // MinHash permutations as universal hashes h_i(x) = (a_i·x + b_i) mod p
  // over a 31-bit base hash x of the shingle (first 8 hex chars of its
  // md5, mod p). p = 2^31−1 (Mersenne prime); a_i < p and x < p keep
  // a_i·x + b_i < 2^62 — exact int64 arithmetic in BOTH engines (DuckDB
  // BIGINT errors on overflow, so the bound is load-bearing). The
  // constants derive from an LCG formula; they are inlined as literals
  // on the Spark side and interpolated into the oracle SQL from the
  // SAME Scala values, so the two engines agree by construction.
  private[graft] val MhP = 2147483647L
  private[graft] val MhA: IndexedSeq[Long] =
    (0 until 16).map(i => (1103515245L * (i + 1) + 12345L) % MhP)
  private[graft] val MhB: IndexedSeq[Long] =
    (0 until 16).map(i => (2654435761L * i + 1013904223L) % MhP)
  /** DuckDB inline seed relation `seeds(s, a, b)`, 16 rows. */
  private def mhSeedsSql: String =
    (0 until 16).map(i => s"(${i}, ${MhA(i)}, ${MhB(i)})")
      .mkString("(VALUES ", ", ", ") seeds(s, a, b)")

  /** Per-document MinHash signature: array of the 16 permutation minima
    * over the document's distinct 3-token shingles.
    *
    * Scale notes: ONE codegen'd md5 per (doc, shingle) row produces the
    * base hash; the 16 permutations are pure int64 arithmetic fused into
    * the map-side-combined hash-agg (16 `min` columns). An earlier
    * version hashed every distinct shingle 16× inside a `transform`
    * lambda and shared the result via join — but higher-order-function
    * lambdas are CodegenFallback (interpreted per element), so 16
    * interpreted md5s per shingle cost far more than one codegen'd md5,
    * AND the distinct+join added two shuffles. This shape is one
    * explode → one shuffle (the groupBy), nothing else. */
  private[graft] def minhashSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // documents is one parquet file → one input partition; spread the
    // shingle/hash work across cores before the heavy transforms (on a
    // cluster the source would already be many splits)
    val par = spark.sparkContext.defaultParallelism
    docsWithToks(spark, sfDir)
      .repartition(par)
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> concat_ws(' ', toks[g], toks[g+1], toks[g+2])))""")).as("s"))
      .withColumn("x",
        expr("conv(substr(md5(s), 1, 8), 16, 10)").cast("long") % MhP)
      .groupBy($"doc_id")
      .agg(array((0 until 16).map(i =>
        min((lit(MhA(i)) * $"x" + lit(MhB(i))) % MhP)): _*).as("sig"))
  }

  /** MinHash signatures (16 md5-permutations over distinct 3-token
    * shingles) + LSH banding (4 bands × 4 rows): candidate pairs come
    * ONLY from full band-hash collisions, estimated Jaccard = matching
    * signature fraction over candidates. Shingling (not raw tokens) is
    * what makes MinHash discriminative when the vocabulary is small
    * relative to the corpus.
    *
    * Scale design: the self-join key is (band, band_hash) — all 4 rows
    * of a band must collide to create a candidate, so bucket sizes stay
    * near-constant and the join is linear in candidates, never the
    * near-quadratic "any 1/16 seeds collide" blowup. The verify step
    * compares the two 16-entry signature arrays with zip_with inside
    * codegen — no flat (doc, seed, h) table is ever shuffled. */
  // Materialized intermediates shared by every consumer in the session
  // (d06 builds signatures + pairs; d12 reuses the pairs for
  // clustering): the checkpoint blocks already live on the executors,
  // so recomputing the pipeline per caller would only burn CPU. Each
  // entry holds the owning session strongly, so its identity hash
  // cannot be recycled while the entry lives, and lookups re-check the
  // session by REFERENCE (`eq`) — a different live session that
  // collides on hash recomputes instead of receiving a foreign
  // DataFrame. Entries of stopped contexts are evicted on every
  // access, so a long-lived JVM hosting many sessions can't pin dead
  // sessions' checkpoint blocks.
  private val dfCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), (SparkSession, Long, Any)]

  /** Combined mtime stamp of the corpus fixtures an entry may derive
    * from (documents / embeddings / events under sfDir) — the
    * skewStatsCache/cachedScratchDir invalidation discipline applied
    * to the whole dfCache (r10 ADVICE: ivf_assigned had no fixture
    * guard): a regenerated fixture at the same path changes the stamp,
    * so the stale entry is rebuilt instead of served. Missing files
    * stamp as 0, which still changes when the file appears. */
  private def fixtureStamp(sfDir: String): Long =
    Seq("documents", "embeddings", "events").foldLeft(0L) { (acc, t) =>
      acc * 1000003L +
        new java.io.File(s"$sfDir/$t.parquet").lastModified()
    }

  /** The session-keyed cache discipline, generic in the value (one
    * definition — DataFrames go through [[cached]] which adds the
    * localCheckpoint; non-DF artifacts like the BPE run pair use this
    * directly). Entries are guarded by [[fixtureStamp]]: a stale stamp
    * rebuilds in place (the put overwrites, so at most one entry per
    * key ever lives). */
  private[operators] def sessionCached[A](spark: SparkSession, sfDir: String,
      what: String)(build: => A): A = {
    dfCache.filterInPlace { case (_, (s, _, _)) => !s.sparkContext.isStopped }
    val stamp = fixtureStamp(sfDir)
    val key = (System.identityHashCode(spark), sfDir, what)
    dfCache.get(key)
      .filter { case (s, st, _) => (s eq spark) && st == stamp }
      .map(_._3.asInstanceOf[A])
      .getOrElse {
        val v = build
        dfCache.put(key, (spark, stamp, v))
        v
      }
  }

  private[operators] def cached(spark: SparkSession, sfDir: String, what: String)(
      build: => DataFrame): DataFrame =
    sessionCached(spark, sfDir, what)(build.localCheckpoint())

  private[graft] def lshPairs(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "lsh_pairs") {
      minhashLshUncached(spark, sfDir)
    }

  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    // total order applied OUTSIDE the checkpoint — see [[graft.operators
    // .VectorOps.lshNearDup]]: checkpointing a sorted plan adds the range
    // sampler's extra pass over the band join, and d12 doesn't need it
    lshPairs(spark, sfDir).orderBy("d1", "d2")

  /** LSH band table (doc_id, band, bh): one row per (doc, band), band
    * hash = the 4 signature entries of that band joined as a string.
    * Shared by d06's candidate self-join and the s24 streaming
    * incremental near-dup ([[graft.streaming.StreamOps]]), so the band
    * definition cannot drift between the batch and streaming faces. */
  private[graft] def lshBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sigs = cached(spark, sfDir, "sigs")(minhashSigs(spark, sfDir))
    sigs.select($"doc_id", explode(expr(
      """transform(sequence(0, 3),
        b -> struct(b AS band,
          array_join(transform(slice(sig, b*4 + 1, 4),
            v -> cast(v as string)), '|') AS bh))""")).as("x"))
      .select($"doc_id", $"x.band".as("band"), $"x.bh".as("bh"))
  }

  private def minhashLshUncached(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // One row per doc; materialized once and read by the band join (both
    // sides) and the two verify joins — at 1B docs this is ~0.5 TB spread
    // across executors, well within a cluster's storage fraction.
    val sigs = cached(spark, sfDir, "sigs")(minhashSigs(spark, sfDir))
    val bands = lshBands(spark, sfDir)
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    cand
      .join(sigs.select($"doc_id".as("d1"), $"sig".as("sig1")), "d1")
      .join(sigs.select($"doc_id".as("d2"), $"sig".as("sig2")), "d2")
      .select($"d1", $"d2",
        round(expr("size(filter(zip_with(sig1, sig2, (x, y) -> x = y), m -> m))") / lit(16.0), 4)
          .as("est_jaccard"))
      .filter($"est_jaccard" >= 0.5)
  }

  /** d35: triangle count + local clustering coefficient per node over
    * the d06 MinHash near-dup graph — the graph-STRUCTURE signal on top
    * of the pair list: a high-coefficient neighborhood is a coherent
    * duplicate community (exact/near copies of one underlying text,
    * safe to collapse to a canonical doc), while a high-degree node
    * with near-zero coefficient is a template/boilerplate attractor
    * chaining unrelated documents — review it, don't collapse it.
    *
    * Scale design: the classic distributed triangle enumeration —
    * edges stay in canonical d1<d2 orientation, so each triangle
    * a<b<c is found exactly once by joining (a,b)⋈(b,c) on the shared
    * middle vertex and closing with a hash probe of (a,c). Both steps
    * are hash equi-joins on vertex keys (never an adjacency
    * cross-product); degrees and per-node counts are map-side-partial
    * hash-aggs. On a skewed graph the canonical orientation bounds the
    * join fan-out (a degree-d hub only pairs its HIGHER-id neighbors)
    * — same reason the order-by-degree variant is the production
    * standard. The coefficient 2T/(d·(d−1)) is [[graft.functions.Det
    * .r4]] exact; the pair table is the same session-cached checkpoint
    * d06/d12/d21 read. */
  def dupTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = lshPairs(spark, sfDir).select($"d1", $"d2")
    val deg = p.select($"d1".as("doc_id"))
      .unionAll(p.select($"d2".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
    val closing = p.select($"d1".as("a"), $"d2".as("c"))
    val tri = p.as("ab")
      .join(p.as("bc"), col("ab.d2") === col("bc.d1"))
      .select(col("ab.d1").as("a"), col("ab.d2").as("b"), col("bc.d2").as("c"))
      .join(closing, Seq("a", "c"))
    val cnt = tri.select(explode(array($"a", $"b", $"c")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(cnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select($"doc_id", $"degree", $"n_triangles",
        when($"degree" < 2, lit(0.0))
          .otherwise(r4($"n_triangles" * 2L, $"degree" * ($"degree" - 1L)))
          .as("clustering"))
      .orderBy($"doc_id")
  }

  /** d38: label-propagation communities (LPA) over the d06 near-dup
    * graph — the community-detection complement to connected components
    * (d12 finds everything reachable; LPA finds DENSELY-linked groups,
    * so a boilerplate bridge between two real dup families doesn't glue
    * them into one cluster): 3 synchronous rounds, each node adopting
    * its neighbors' most frequent label (count desc, min label
    * tiebreak — all-integer, bit-identical in both engines).
    *
    * Scale design: per round ONE hash join of the edge list with the
    * label table on the source key + two hash-aggs (neighbor-label
    * counts, per-node argmax as a (count, −label) struct max) — never
    * an adjacency matrix, never a window over the full edge set;
    * per-round localCheckpoint keeps lineage flat like d29. Reads the
    * same cached pair checkpoint as d12/d21/d35. */
  def labelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = lshPairs(spark, sfDir).select($"d1", $"d2")
    val e = p.unionAll(p.select($"d2".as("d1"), $"d1".as("d2")))
      .localCheckpoint()
    var lab = e.select($"d1".as("node")).distinct()
      .withColumn("label", $"node")
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val best = e.join(lab, $"d1" === $"node")
        .groupBy($"d2", $"label").agg(count(lit(1)).as("c"))
        .groupBy($"d2")
        .agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
        .select($"d2".as("node"), (-$"m.nl").as("newlab"))
      lab = lab.join(best, Seq("node"), "left")
        .select($"node", coalesce($"newlab", $"label").as("label"))
        .localCheckpoint()
    }
    lab.select($"node".as("doc_id"), $"label".as("community"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy($"community")))
      .orderBy($"doc_id")
  }

  /** d42: systematic PPS sampling (probability proportional to size) —
    * the token-budget complement to d13's Bernoulli hash sampling: per
    * source, documents in doc_id order span a cumulative token axis;
    * sampling points sit at every multiple of step = ⌈total/20⌉, and a
    * document is drawn once per point inside its span (long documents
    * can be drawn multiple times — that IS pps-with-replacement, the
    * upsampling a quality-weighted data mix performs). Zero RNG: the
    * draw is a pure integer function of the ordered cumulative sums,
    * so any engine reproduces it bit-for-bit.
    *
    * Scale design: one window cumsum per source (single exchange —
    * same shape as d17's packing), one broadcast of the 20-row
    * per-source totals, and a pure map filter; nothing global, no
    * sort beyond the per-source window order. */
  def ppsSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = docsWithToks(spark, sfDir)
      .select($"doc_id", $"source", size($"toks").cast("long").as("n_tok"))
      .withColumn("cum", sum($"n_tok").over(w))
    val totals = t.groupBy($"source")
      .agg(max($"cum").as("total"))
      .select($"source",
        call_function("div", $"total" + 19L, lit(20L)).as("step"))
    t.join(broadcast(totals), "source")
      // sampling points k·step (k ≥ 1) inside (cum − n_tok, cum]
      .withColumn("n_picks",
        call_function("div", $"cum", $"step") -
          call_function("div", $"cum" - $"n_tok", $"step"))
      .filter($"n_picks" > 0)
      .select($"source", $"doc_id", $"n_tok", $"n_picks")
      .orderBy($"source", $"doc_id")
  }

  /** d41: top-20 token pairs by document-level PMI — the
    * distributional-semantics co-occurrence statistic (collocation
    * mining / phrase discovery for tokenizer seeding): PMI(a,b) =
    * ln(N·c(a,b) / (c(a)·c(b))) over document co-occurrence counts,
    * micro-rounded to 10⁻⁴ integer units (the d33 contract: ONE
    * engine-matching double op per pair, then exact integer ordering).
    *
    * Scale design: the pair table comes from a SELF-JOIN of the
    * per-doc distinct-token list keyed on doc_id — per-doc output is
    * c(doc)² in DISTINCT tokens (bounded by doc length, the standard
    * co-occurrence bound), never vocabulary². Marginals are one
    * hash-agg; at fixture scale they broadcast, at web scale the same
    * joins run shuffled on the token key. The c(a,b) ≥ 5 support
    * filter prunes before the marginal joins. */
  def pmiPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dt = docsWithToks(spark, sfDir)
      .select($"doc_id", explode(array_distinct($"toks")).as("tok"))
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_total"))
    val marg = dt.groupBy($"tok").agg(count(lit(1)).as("c"))
    val pairs = dt.as("a")
      .join(dt.as("b"), $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
      .groupBy($"a.tok".as("ta"), $"b.tok".as("tb"))
      .agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 5)
    pairs
      .join(broadcast(marg.select($"tok".as("ta"), $"c".as("ca"))), "ta")
      .join(broadcast(marg.select($"tok".as("tb"), $"c".as("cb"))), "tb")
      .crossJoin(broadcast(nDocs))
      .select($"ta", $"tb", $"cab", $"ca", $"cb",
        round(log(($"cab" * $"n_total") / ($"ca" * $"cb").cast("double"))
          * 10000).cast("long").as("pmi_micro"))
      .orderBy(desc("pmi_micro"), $"ta", $"tb").limit(20)
  }

  /** 16-bit SimHash over term-frequency-weighted md5 bits; identical
    * signatures bucket together (n_bucket = docs sharing the hash). */
  /** Per-doc SimHash bit string of the given width (≤ 32: one md5 hex
    * digit drives each bit). Each token occurrence is md5'd ONCE in
    * codegen; the per-bit ±1 sums are `width` fused columns of one
    * map-side-combined hash-agg — the same one-hash-then-integer-math
    * shape as [[minhashSigs]] (a per-bit `aggregate` lambda would
    * re-run an interpreted md5 per token PER BIT: width× the work). */
  private def simhashSigs(spark: SparkSession, sfDir: String,
      width: Int): DataFrame = {
    import spark.implicits._
    // bit i set ⇔ hex digit i ≥ 8; lexicographic `>= '8'` is exact for
    // the md5 alphabet 0-9a-f (one comparison instead of a substring
    // search per bit — this runs width× per token occurrence)
    val bitSums = (1 to width).map(i =>
      sum(when(expr(s"substr(m, $i, 1) >= '8'"), 1)
        .otherwise(-1)).as(s"s_$i"))
    docsWithToks(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id", explode($"toks").as("t"))
      .select($"doc_id", md5($"t").as("m"))
      .groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id",
        concat((1 to width).map(i =>
          when(col(s"s_$i") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    simhashSigs(spark, sfDir, 16)
      .withColumn("n_bucket",
        count(lit(1)).over(Window.partitionBy($"simhash")))
      .orderBy($"doc_id")
  }

  /** SimHash Hamming-ball near-dup (the Google web-dedup shape): find
    * all pairs whose 32-bit SimHash signatures differ in ≤ 1 bit.
    * Candidates come from SEGMENT BANDING — split the signature into 2
    * segments of 16 bits; by pigeonhole, a single flipped bit leaves
    * one segment identical, so every qualifying pair collides on some
    * segment — then the exact Hamming distance verifies candidates
    * only. Same LSH skeleton as d06/v08: the self-join keys on
    * (segment index, segment bits), linear in collisions, never all
    * pairs. The signature/segment width IS the selectivity knob (d07's
    * 16-bit signature buckets this small-vocabulary fixture far too
    * densely — 90 partners/doc); production web dedup runs this same
    * plan at 64 bits with 4×16-bit segments for Hamming ≤ 3. */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // integer signature: bit i (1-based, MSB first) = 2^(32-i); all set
    // math below (segment keys, hamming) is int64 codegen — no strings
    // cross the shuffle, no per-candidate lambda
    val sh = cached(spark, sfDir, "simhash_int32") {
      simhashSigs(spark, sfDir, 32)
        .select($"doc_id",
          expr("""aggregate(sequence(1, 32), 0L,
            (acc, i) -> acc * 2L + (case when substr(simhash, i, 1) = '1'
                                    then 1L else 0L end))""").as("sig"))
    }
    simhashPairsFromSigs(sh)
  }

  /** The d19 banded candidate + Hamming verify over any (doc_id, sig)
    * frame — split out so the pigeonhole completeness (every
    * Hamming-≤1 pair collides on some 16-bit segment) is fuzzable
    * against brute force on arbitrary signatures (GraftSpec). */
  private[graft] def simhashPairsFromSigs(sh: DataFrame): DataFrame = {
    import sh.sparkSession.implicits._
    val seg = sh.select($"doc_id",
      posexplode(array(
        call_function("div", $"sig", lit(65536L)),
        $"sig" % 65536L)).as(Seq("s", "seg")))
    val cand = seg.as("a")
      .join(seg.as("b"),
        $"a.s" === $"b.s" && $"a.seg" === $"b.seg" &&
          $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(lit(1))
      .select($"d1", $"d2")
    cand
      .join(sh.select($"doc_id".as("d1"), $"sig".as("s1")), "d1")
      .join(sh.select($"doc_id".as("d2"), $"sig".as("s2")), "d2")
      .withColumn("hamming", bit_count(expr("s1 ^ s2")).cast("long"))
      .filter($"hamming" <= 1)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  /** Exact n-gram (3-token shingle) Jaccard near-dup pairs ≥ 0.5.
    *
    * Structure (the All-Pairs / PPJoin shape, exact — no recall loss):
    *
    *  1. Shingles are xxhash64'd once per doc; all later set math runs
    *     on slim int64 keys, not 17-char strings. Document frequency is
    *     a hash-agg (map-side combined, sort-free) over the exploded
    *     (doc, hash) table, and the join back on h reuses the same
    *     exchange. The per-doc regroup (`byDoc`) then derives the
    *     sorted set array, set size, and prefix slice array-side in a
    *     single pass — a per-row `sort_array` over ~doc-length structs
    *     replaces a global WindowExec sort by (doc, df, h).
    *  2. PREFIX FILTER: order each doc's shingles by global document
    *     frequency ascending (rarest first, hash as tiebreak). If
    *     Jaccard(a,b) ≥ t then |a∩b| ≥ ⌈t·|a|⌉, so the pair must share
    *     a shingle within each side's first |d| − ⌈t·|d|⌉ + 1 shingles
    *     — the self-join runs on those prefixes only. Rarest-first is
    *     the skew bound: a stop-shingle with huge df sorts last and
    *     drops out of almost every prefix, so it never drives the join.
    *  3. POSITIONAL FILTER in the join condition: a match at prefix
    *     ranks (ra, rb) caps the possible overlap at
    *     min(na−ra, nb−rb)+1, which must reach the Jaccard-≥-t minimum
    *     ⌈t/(1+t)·(na+nb)⌉ — pairs sharing only late-prefix shingles
    *     are dropped before the shuffle.
    *  4. Verify joins the slim (d1, d2) candidates back to `byDoc`
    *     and computes the exact intersection with the codegen'd
    *     two-pointer `graft_sorted_isect` (Spark's `array_intersect`
    *     builds a hash set per row — ~100× slower here). The doc-set
    *     side broadcasts when small; at cluster scale it is a linear
    *     shuffle join on doc_id.
    *
    * "Exact" is modulo the 64-bit shingle hashing: a xxhash64 collision
    * would silently merge two distinct shingles. By the birthday bound,
    * P(any collision) ≈ u²/2^65 for u distinct shingles — ~3% at u=1B
    * corpus-wide, and a collision only perturbs a pair's Jaccard by
    * ~1/|union| (it can't invent a near-dup pair). If the corpus grows
    * past ~10B distinct shingles, widen to two independent xxhash64
    * seeds (128 bits) or verify candidates on raw shingle strings.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    pairsFromByDoc(spark, byDocCached(spark, sfDir))

  /** d22: the scale-correct composition the 10× scaling probe (SURVEY
    * round-5 note) prescribes — collapse EXACT duplicates first, then
    * run all-pairs near-dup among canonical representatives only. An
    * all-pairs output is inherently quadratic in duplicate-group size
    * (c copies ⇒ c² pairs), so a 100 TB corpus with heavy verbatim
    * duplication must canonicalize before the pair stage: the collapse
    * is one sublinear window over md5(text), and the pair stage then
    * runs on the (much smaller) canonical set. Pair list ⊆ d08's,
    * restricted to min-doc_id representatives of each identical-text
    * group.
    *
    * Shares d08's cached per-doc shingle table, filtered to reps with
    * a semi-join: the prefix ordering inside that table uses document
    * frequencies over ALL docs, which is still ONE consistent global
    * shingle order — PPJoin completeness only requires both prefixes
    * to be taken under the same total order, not any particular one —
    * so the rep-subset pair set is exact. */
  def canonicalNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val repIds = Tables.documents(spark, sfDir)
      .withColumn("rep",
        min($"doc_id").over(Window.partitionBy(md5($"text"))))
      .filter($"doc_id" === $"rep")
      .select($"doc_id")
    pairsFromByDoc(spark,
      byDocCached(spark, sfDir).join(repIds, Seq("doc_id"), "left_semi"))
  }

  private val JaccT = 0.5

  /** Per-doc shingle table (n, sorted hash set, rarest-first prefix) —
    * ONE session-cached materialization serving d08's prefix path,
    * both verify sides, and d22's rep-filtered rerun. */
  private def byDocCached(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "d08_bydoc") {
      byDocFrom(docsWithToks(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism))
    }

  /** The byDoc build over any (doc_id, toks) frame — split out so the
    * PPJoin prefix/positional bounds are fuzzable against brute force
    * on constructed corpora (GraftSpec). */
  private[graft] def byDocFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val t = JaccT
    // one (doc, shingle-hash) row per distinct shingle occurrence
    val tok = docs
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
    // Document frequency in the SAME pass as the shingle shuffle: one
    // window count over (partition by h) — the rows are already
    // hash-partitioned by h for it, so this replaces the former
    // groupBy(h)+join-back (two exchanges) with one. The per-doc regroup
    // then builds EVERYTHING array-side in one pass: the df-ordered
    // struct list (sort_array over ~doc-length elements — bounded per
    // row, no global WindowExec sort by (doc, df, h)), the sorted hash
    // set for the verify step, and the rarest-first prefix slice. One
    // materialization serves the prefix path and both verify sides.
    val withDf = tok.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"h")))
    withDf
      .groupBy($"doc_id").agg(
        sort_array(collect_list(struct($"df", $"h"))).as("sdh"))
      .select($"doc_id",
        size($"sdh").cast("long").as("n"),
        expr("array_sort(transform(sdh, x -> x.h))").as("hs"),
        expr(s"slice(sdh, 1, size(sdh) - cast(ceil(size(sdh) * $t) as int) + 1)")
          .as("pref"))
  }

  /** [[ngramJaccard]] over any (doc_id, toks) frame (fuzz entry). */
  private[graft] def ngramJaccardFrom(docs: DataFrame): DataFrame =
    pairsFromByDoc(docs.sparkSession, byDocFrom(docs))

  private def pairsFromByDoc(spark: SparkSession, byDoc: DataFrame): DataFrame = {
    import spark.implicits._
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    val t = JaccT
    val prefix = byDoc.select($"doc_id", $"n",
        posexplode($"pref").as(Seq("r0", "x")))
      .select($"doc_id", $"n", $"x.h".as("h"), ($"r0" + 1).as("r"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
          least($"a.n" - $"a.r", $"b.n" - $"b.r") + 1 >=
            ceil(($"a.n" + $"b.n") * lit(t) / (1 + t)))
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
    // A pair sharing k prefix shingles appears k times — verify all k
    // and dedup AFTER the jaccard filter: the k copies cost k cheap
    // codegen'd intersections, while deduping first costs a full
    // exchange of the candidate multiset (measured slower at every sf).
    // The slim candidate list should broadcast so the wide
    // (doc, hash-array) table is probed in place — but NOT via an
    // unconditional hint: a pathological corpus with huge candidate
    // multiplicity would OOM the driver. AQE's runtime size stats pick
    // the broadcast when cand is small (the normal case, plan-asserted
    // in PlanShapeSpec) and fall back to a shuffle join when it isn't.
    cand
      .join(byDoc.select($"doc_id".as("d1"), $"hs".as("h1"), $"n".as("n1")), "d1")
      .join(byDoc.select($"doc_id".as("d2"), $"hs".as("h2"), $"n".as("n2")), "d2")
      .withColumn("common",
        call_function("graft_sorted_isect", $"h1", $"h2").cast("long"))
      .select($"d1", $"d2",
        round($"common" / ($"n1" + $"n2" - $"common").cast("double"), 4)
          .as("jaccard"))
      .filter($"jaccard" >= t)
      .dropDuplicates("d1", "d2")
      .orderBy($"d1", $"d2")
  }

  /** TF-IDF: top-3 terms per document (tf × ln(N/df), deterministic
    * tie-break on term). */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = docsWithToks(spark, sfDir)
    val tf = docs.select($"doc_id", explode($"toks").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct($"doc_id").as("n_total"))
    val w = Window.partitionBy($"doc_id").orderBy(desc("score"), $"term")
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round($"tf" * log($"n_total" / $"df".cast("double")), 4))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"doc_id", $"rn".cast("long").as("rn"), $"term", $"score")
      .orderBy($"doc_id", $"rn")
  }

  /** Marker-token language ID (n-gram-profile heuristic shape): score
    * each language by marker overlap, argmax with deterministic
    * preference order; reported as a confusion matrix against the
    * labeled lang. (The fixture vocabulary is shared across langs, so
    * accuracy is incidental — the operator shape is what matters.) */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .withColumn("dtoks", array_distinct($"toks"))
      .withColumn("s_en", size(expr("array_intersect(dtoks, array('the', 'a'))")))
      .withColumn("s_es", size(expr("array_intersect(dtoks, array('data', 'table'))")))
      .withColumn("s_de", size(expr("array_intersect(dtoks, array('key', 'value'))")))
      .withColumn("s_fr", size(expr("array_intersect(dtoks, array('join', 'merge'))")))
      .withColumn("s_zh", size(expr("array_intersect(dtoks, array('spark', 'hash'))")))
      .withColumn("predicted",
        when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_zh", "en")
          .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr" && $"s_es" >= $"s_zh", "es")
          .when($"s_de" >= $"s_fr" && $"s_de" >= $"s_zh", "de")
          .when($"s_fr" >= $"s_zh", "fr")
          .otherwise("zh"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  /** BPE-ish token counting: regex word segmentation plus fixed-width
    * subword chunks (a deterministic stand-in for a learned BPE vocab —
    * same pipeline shape: word split → subword merge table lookup). */
  def regexTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("words", expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')"))
      .select($"doc_id",
        size($"words").cast("long").as("n_words"),
        expr("aggregate(words, 0L, (acc, w) -> acc + cast(ceil(length(w) / 4.0) as long))")
          .as("n_subwords"),
        size(array_distinct($"words")).cast("long").as("n_uniq_words"))
      .orderBy($"doc_id")
  }

  /** Per-language Zipf slope: OLS fit of ln(frequency) on ln(rank) over
    * each language's top-100 token ranks — the corpus-health statistic
    * (natural language sits near −1; generated/templated junk drifts
    * flat). An aggregate linear regression done the deterministic way:
    * each log is rounded to a 10⁻⁴-precision integer FIRST, then the
    * OLS slope is the exact integer rational
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, half-up-rounded to 4 dp via
    * [[graft.functions.Det.r4]] — bit-identical in both engines because
    * only one engine-matching double op (the ln) happens per term, at
    * micro precision, before the arithmetic goes exact.
    *
    * Scale design: one hash-agg for term frequencies, one per-lang
    * top-100 rank (bounded state per group), one final tiny agg. The
    * rank-100 cap is what bounds the integer sums at ANY corpus scale:
    * x ≤ ln(100)·10⁴ fixed, y ≤ ln(Σtokens)·10⁴ ≈ 3·10⁵ even at 10¹²
    * tokens, so `n·Σxy·20000` stays far under 2⁶³ (fitting the head of
    * the distribution is also the standard Zipf methodology). */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = docsWithToks(spark, sfDir)
      .select($"lang", explode($"toks").as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("c"))
    val ranked = tf
      .withColumn("rank", row_number().over(
        Window.partitionBy($"lang").orderBy(desc("c"), $"tok")))
      .filter($"rank" <= 100)
    val xy = ranked.select($"lang",
      round(log($"rank") * 1e4).cast("long").as("x"),
      round(log($"c") * 1e4).cast("long").as("y"))
    xy.groupBy($"lang")
      .agg(count(lit(1)).as("n_ranks"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"lang", $"n_ranks",
        r4($"n_ranks" * $"sxy" - $"sx" * $"sy",
          $"n_ranks" * $"sxx" - $"sx" * $"sx").as("zipf_slope"))
      .orderBy($"lang")
  }

  /** d37: inverted-index build — the retrieval-side artifact (d28 BM25
    * scores against exactly this structure): for the 50 highest-df
    * terms, the document frequency, total term frequency, and the
    * posting list capped to the 10 lowest doc_ids as "doc:tf" entries.
    *
    * Scale design: postings per term are UNBOUNDED at corpus scale, so
    * the cap is enforced BEFORE any list is collected — a row_number
    * window keyed on term keeps ≤ 10 rows per term, and only those
    * reach the bounded collect_list. df/tf totals come from a separate
    * map-side-combined hash-agg over the same tf table (never from the
    * capped rows), and the 50-term head is a LIMIT after one tiny agg —
    * production index builds shard postings by doc-range exactly this
    * way. */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = docsWithToks(spark, sfDir)
      .select($"doc_id", explode($"toks").as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val top = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("tf_total"))
      .orderBy(desc("df"), $"term").limit(50)
    val postings = tf
      .join(broadcast(top.select($"term")), "term")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"term").orderBy($"doc_id")))
      .filter($"rn" <= 10)
      .groupBy($"term")
      .agg(array_join(transform(
        sort_array(collect_list(struct($"doc_id", $"tf"))),
        x => concat(x("doc_id"), lit(":"), x("tf"))), ",").as("postings"))
    broadcast(top).join(postings, "term")
      .select($"term", $"df", $"tf_total", $"postings")
      .orderBy(desc("df"), $"term")
  }

  /** d36: byte-pair-encoding merge learning (tokenizer training) at the
    * token level — 3 greedy merge rounds: count adjacent unit pairs,
    * take the globally most frequent (count desc, pair asc), rewrite
    * the corpus merging non-overlapping occurrences left-to-right,
    * repeat on the rewritten corpus. Output: one row per round with the
    * learned merge, its pair count at selection time, and how many
    * merges actually applied (overlapping occurrences of an "x x" pair
    * in an "x x x" run merge greedily — only every other position).
    *
    * Left-to-right greedy is resolved DECLARATIVELY: match positions
    * form gaps-and-islands runs per document (pos − row_number), and
    * within a run exactly the odd offsets merge — the same window logic
    * runs in both engines, so overlap resolution cannot drift.
    *
    * Scale design: the corpus rides ONE positional (doc, pos, unit)
    * table hash-partitioned by doc_id; every window in every round
    * reuses that partitioning (no further corpus exchanges), pair
    * counting is a map-side-combined hash-agg, and the argmax is a
    * 1-row bounded scalar (the k-means-centroid pattern). Each round's
    * rewrite is localCheckpointed so round N+1's lineage starts flat —
    * without it the triple fan-out per round (counts, match scan,
    * rewrite all read the same table) recomputes exponentially.
    *
    * Job economy (the r7 verdict's ask): ONE stats job per round
    * yields BOTH the argmax (min(struct(−cnt, tok, nxt)) over the pair
    * groups — same (cnt desc, pair asc) tiebreak as an ORDER BY) and
    * Σcnt, and the applied-merge count telescopes through Σcnt deltas
    * (each applied merge removes exactly one row, and the per-doc
    * null-nxt row count is constant, so T_{i−1} − T_i =
    * np_{i−1} − np_i) — the separate per-round count job is gone, and
    * the LAST round's rewrite skips its checkpoint store (nothing
    * reads it but the final pair recount). 11 jobs → 7 at the same
    * answer; the global agg rides the pair GROUPS (≪ rows), adding no
    * width to the map-side combine. */
  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    bpeRunCached(spark, sfDir)._1

  /** One BPE training run per (session, sfDir) — the summary AND the
    * final rewritten corpus, shared by d36 (merge table) and d48
    * (fertility over the final corpus). The final corpus comes back
    * UN-checkpointed: a d36-only session keeps the skip optimization
    * (nothing materializes a table only the final recount reads);
    * d48's first access checkpoints it through [[cached]]. */
  private def bpeRunCached(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) =
    sessionCached(spark, sfDir, "bpe_run") {
      bpeRun(spark, docsWithToks(spark, sfDir))
    }

  /** [[bpeMerges]] body over any (doc_id, toks) frame — split out so the
    * greedy-overlap parity logic ("x x x x" merges twice, not thrice)
    * is testable on constructed corpora the fixture doesn't contain. */
  private[graft] def bpeMergesFrom(spark: SparkSession,
      docs: DataFrame): DataFrame =
    bpeRun(spark, docs)._1

  /** The training loop; returns (per-round summary, final positional
    * corpus (doc_id, pos, tok, nxt) — NOT checkpointed: the summary
    * path never re-reads it, and [[tokenizerFertility]] checkpoints on
    * first use). */
  private def bpeRun(spark: SparkSession,
      docs: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    // AQE stays ON (re-measured per the r7 verdict): with the old
    // 11-job round structure, per-stage re-planning cost ~25% of wall
    // time and OFF won; with the folded 7-job structure the balance
    // flips — AQE's post-shuffle coalescing trims the tiny window
    // stages and ON is ~10% faster at sf0.1 (interleaved 5-rep
    // medians: on 4.37/3.90 s vs off 5.07/4.42 s). ON is also the
    // 100 TB default (skew handling); the session value is left
    // untouched.
    {
      val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
      // the checkpointed per-round artifact is (doc, pos, tok, nxt) —
      // the lead window runs ONCE per round (inside the rewrite job);
      // the stats pass is then a pure hash-agg over the checkpoint
      // with no sort at all
      var withNext = docs
        .select($"doc_id", posexplode($"toks").as(Seq("p0", "tok")))
        .select($"doc_id", ($"p0" + 1L).as("pos"), $"tok")
        .withColumn("nxt", lead($"tok", 1).over(wDoc))
        .localCheckpoint()
      // ONE job: Σ pair counts (for the telescoping applied-merge
      // deltas) + the argmax pair with the (cnt desc, tok asc, nxt asc)
      // tiebreak via min(struct(−cnt, tok, nxt)); a degenerate corpus
      // with no pairs left returns (0, None) — the caller stops early,
      // and the oracle's per-round CTEs go empty at the same point
      def stats(df: DataFrame): (Long, Option[(String, String, Long)]) = {
        val r = df.filter($"nxt".isNotNull)
          .groupBy($"tok", $"nxt").agg(count(lit(1)).as("cnt"))
          .agg(sum($"cnt").as("np"),
            min(struct((-$"cnt").as("nc"), $"tok".as("a"), $"nxt".as("b")))
              .as("m"))
          .collect().head
        if (r.isNullAt(0)) (0L, None)
        else {
          val m = r.getStruct(1)
          (r.getLong(0), Some((m.getString(1), m.getString(2),
            -m.getLong(0))))
        }
      }
      val nRounds = 3
      val learned = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long)]
      val nps = scala.collection.mutable.ArrayBuffer.empty[Long]
      var done = false
      for (it <- 1 to nRounds if !done) {
        val (np, bestOpt) = stats(withNext)
        nps += np
        bestOpt match {
          case None => done = true
          case Some((a, b, cnt)) =>
            learned += ((it.toLong, s"$a $b", cnt))
            val keep = withNext
              .filter($"tok" === a && $"nxt" === b)
              .withColumn("grp", $"pos" - row_number().over(wDoc))
              .withColumn("k", row_number().over(
                Window.partitionBy($"doc_id", $"grp").orderBy($"pos")))
              .filter($"k" % 2 === 1)
              .select($"doc_id", $"pos")
            val marks = keep.select($"doc_id", $"pos", lit(1).as("mk"))
              .unionAll(keep.select($"doc_id", ($"pos" + 1L).as("pos"),
                lit(2).as("mk")))
            val rewritten = withNext.join(marks, Seq("doc_id", "pos"), "left")
              .filter($"mk".isNull || $"mk" === 1)
              .select($"doc_id", $"pos".as("oldpos"),
                when($"mk" === 1, concat_ws(" ", $"tok", $"nxt"))
                  .otherwise($"tok").as("tok"))
              .select($"doc_id",
                row_number().over(Window.partitionBy($"doc_id")
                  .orderBy($"oldpos")).cast("long").as("pos"),
                $"tok")
              .withColumn("nxt", lead($"tok", 1).over(wDoc))
            // the last round's rewrite feeds ONLY the final pair
            // recount on this path — computing it inside that count
            // job beats materializing a checkpoint nothing else reads
            // (d48 checkpoints its own read through `cached`)
            withNext =
              if (it < nRounds) rewritten.localCheckpoint() else rewritten
        }
      }
      // close the telescope: np after the final executed round (the
      // early-stop path already measured it — its last stats call saw
      // the final table)
      if (!done) nps += withNext.filter($"nxt".isNotNull).count()
      val rows = learned.zipWithIndex.map { case ((it, merge, cnt), i) =>
        (it, merge, cnt, nps(i) - nps(i + 1))
      }.toSeq
      (rows.toDF("it", "merge", "n_pairs", "n_applied").orderBy($"it"),
        withNext)
    }
  }

  /** d48: tokenizer fertility/compression evaluation — the step that
    * closes d36's loop (train → APPLY → evaluate): the learned merges'
    * final rewritten corpus, aggregated per language into the metric a
    * tokenizer team actually reads — units per original word
    * (compression; the inverse of fertility) and how many units are
    * merged pairs. A vocabulary trained on a mixed corpus compresses
    * its dominant language best; this table is where that bias becomes
    * visible.
    *
    * Scale design: the final corpus comes from the SHARED
    * [[bpeRunCached]] run (d36 and d48 pay the 3 training rounds once
    * per session; this query checkpoints the corpus on first access);
    * on top of it: one doc_id hash-agg (rides the corpus
    * partitioning), a join to the per-doc lang/word-count projection on
    * doc_id, and a ≤5-row language rollup. Counts are exact longs,
    * compression the r4 exact rational. */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the shared run's final corpus, checkpointed on first d48 access
    // (recomputes at most the final rewrite round from the round-2
    // checkpoint, once) — d36-only sessions never pay this
    val corpus = cached(spark, sfDir, "bpe_final") {
      bpeRunCached(spark, sfDir)._2
    }
    val perDoc = corpus.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_units"),
        sum(when($"tok".contains(" "), 1L).otherwise(0L)).as("n_merged"))
    val langs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_words"))
    perDoc.join(langs, "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("n_words"),
        sum($"n_units").as("n_units"),
        sum($"n_merged").as("n_merged"))
      .select($"lang", $"n_docs", $"n_words", $"n_units", $"n_merged",
        r4($"n_units", $"n_words").as("compression"))
      .orderBy($"lang")
  }

  /** Deterministic stratified sampling + train/val/test split — the
    * training-data-mixing staple, done the way it scales: NO RNG and NO
    * shuffle. Membership is a pure function of the row key (a hex
    * prefix of md5 compared against a per-stratum threshold), so the
    * sample is reproducible across engines, runs, and cluster sizes,
    * and re-running on grown data keeps prior decisions stable. Rates:
    * 'en' keeps 128/256 of docs, other langs 51/256; kept docs split
    * 204/26/26 per 256 into train/val/test on an independent salt. */
  /** The deterministic sample/split membership on any documents-shaped
    * DataFrame — ONE implementation shared by [[sampleSplit]],
    * [[decontaminate]], and the curation pipeline, so a rate change can
    * never leave a consumer checking a different partition than the one
    * it claims to. */
  private[graft] def withSampleSplit(df: DataFrame): DataFrame =
    df
      .withColumn("keep_bucket",
        substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 2))
      .filter(col("keep_bucket") <
        when(col("lang") === "en", "80").otherwise("33"))
      .withColumn("split_bucket",
        substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
      .withColumn("split",
        when(col("split_bucket") < "cc", "train")
          .when(col("split_bucket") < "e6", "val")
          .otherwise("test"))

  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withSampleSplit(docsWithToks(spark, sfDir))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"),
        sum(size($"toks")).as("total_tokens"))
      .orderBy($"lang", $"split")
  }

  /** Benchmark decontamination: flag training documents that share any
    * 3-token n-gram with a held-out evaluation document — the standard
    * pre-training hygiene pass (an eval answer leaking into the training
    * set inflates benchmark scores). The train/held-out membership is
    * [[sampleSplit]]'s deterministic hash split (train vs test), so the
    * whole check is reproducible with no RNG.
    *
    * Scale design: in production the held-out side is a FIXED benchmark
    * corpus (thousands of docs — bounded, not growing with the training
    * corpus), so its DISTINCT shingle-hash set is broadcast and the
    * train-side scan never shuffles — each train document's shingles
    * probe the broadcast hash table map-side, then one hash-agg counts
    * hits per document. The fixture's test split STANDS IN for that
    * benchmark; if the held-out side ever scales with the corpus, this
    * broadcast must become a shuffle semi-join (drop the hint — AQE
    * picks correctly from stats). Shingles travel as xxhash64 int64s
    * (same ~2⁻⁶⁵ collision bound as d08 — a collision can only add a
    * false contamination hit, never hide one... strictly it could also
    * merge two train-side shingles, which is why hits count DISTINCT
    * hashes). */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = withSampleSplit(docsWithToks(spark, sfDir))
    def shingles(df: DataFrame) = df
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
    val train = shingles(docs.filter($"split" === "train"))
    val heldout = shingles(docs.filter($"split" === "test"))
      .select($"h").distinct()
    val sizes = train.groupBy($"doc_id").agg(count(lit(1)).as("n_ngrams"))
    train.join(broadcast(heldout), "h")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .join(sizes, "doc_id")
      .select($"doc_id", $"n_ngrams", $"n_shared",
        r4($"n_shared", $"n_ngrams").as("contamination"))
      .orderBy($"doc_id")
  }

  /** Decontamination through a DISTRIBUTED BLOOM FILTER — the shape d15
    * takes when the held-out corpus outgrows a plain broadcast set: the
    * held-out shingle hashes are folded into a fixed 64 Kbit / 4-probe
    * Bloom filter by a distributed `bit_or` aggregation (1024 int64
    * words, ≤ 8 KB collected to the driver — a scalar-sized pull like
    * the k-means centroids), and the TRAIN side probes the 8 KB literal
    * map-side inside codegen. Only bloom-positive shingles — true hits
    * plus the ~2⁻¹³-per-probe false-positive trickle at this fill — pay
    * the exact verification join, so the shuffle is proportional to the
    * candidate hits, not to the corpus.
    *
    * The result is EXACTLY the no-bloom answer (Bloom filters have no
    * false negatives; the verify join removes false positives), which
    * is what the oracle checks. Held-out here is the val+test splits —
    * a larger held-out side than d15's (test-only), i.e. the regime the
    * bloom path is for.
    *
    * At 100 TB: the filter size is a tuning constant (a real benchmark
    * suite's shingle set at ~1% fill of m bits keeps the false-positive
    * rate ≈ (k·n/m)^k); the build stays one agg + one tiny collect, and
    * the probe stays free of any join or shuffle. */
  def bloomDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = withSampleSplit(docsWithToks(spark, sfDir))
    def shingles(df: DataFrame) = df
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
    val train = shingles(docs.filter($"split" === "train"))
    // held-out = everything not trained on; one materialization feeds
    // both the bloom build and the exact verify join
    val heldout = shingles(docs.filter($"split" =!= "train"))
      .select($"h").distinct().localCheckpoint()
    // build: 4 probe positions per hash → (word, bit) → bit_or per word
    val wordMap = heldout
      .select(explode(expr(
        "transform(sequence(0, 3), j -> pmod(xxhash64(h, j), 65536))")).as("pos"))
      .select(expr("CAST(pos AS INT) DIV 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy($"word").agg(expr("bit_or(mask)").as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val bloom = typedLit((0 until 1024).map(i => wordMap.getOrElse(i, 0L)))
    // probe: same position derivation; variable shifts go through expr
    // (the functions-API shiftleft takes only literal shift amounts)
    val member = (0 until 4).map { j =>
      s"""((element_at(bw, CAST(CAST(pmod(xxhash64(h, $j), 65536) AS INT) DIV 64 + 1 AS INT))
         & shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(h, $j), 65536) % 64 AS INT))) != 0)"""
    }.mkString(" AND ")
    val sizes = train.groupBy($"doc_id").agg(count(lit(1)).as("n_ngrams"))
    train.withColumn("bw", bloom).filter(expr(member)).drop("bw")
      .join(heldout, "h") // exact verify: drops bloom false positives
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .join(sizes, "doc_id")
      .select($"doc_id", $"n_ngrams", $"n_shared",
        r4($"n_shared", $"n_ngrams").as("contamination"))
      .orderBy($"doc_id")
  }

  /** Cross-document BOILERPLATE detection (the C4-style cleanup pass,
    * complementary to d18's WITHIN-doc repetition): documents are cut
    * into non-overlapping 5-token chunks, a chunk that appears in ≥ 3
    * distinct documents is boilerplate (nav bars, license headers,
    * templated footers), and each document reports the fraction of its
    * chunks that are boilerplate — the score a pretraining filter
    * thresholds on.
    *
    * Scale design: chunks travel as xxhash64 int64s; the corpus-wide
    * chunk document-frequency is one map-side-combined hash-agg over
    * distinct (doc, chunk) rows, and the flag joins back on the chunk
    * hash — the same exchange the count produced. Frequency skew (a
    * chunk in millions of docs) caps at the distinct-doc collapse, and
    * the ratio rounds in exact integer arithmetic ([[graft.functions
    * .Det.r4]]). */
  def boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val chunks = docsWithToks(spark, sfDir)
      .filter(size($"toks") >= 5)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks)-5, 5),
          i -> xxhash64(concat_ws(' ', slice(toks, i+1, 5))))""")).as("h"))
      .distinct()
    val df = chunks.groupBy($"h")
      .agg(count(lit(1)).as("n_docs_with"))
    chunks.join(df, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n_docs_with" >= 3, 1L).otherwise(0L)).as("n_boiler"))
      .select($"doc_id", $"n_chunks", $"n_boiler",
        r4($"n_boiler", $"n_chunks").as("boiler_frac"))
      .orderBy($"doc_id")
  }

  /** One row per (doc, adjacent-token bigram) — shared by the d16
    * self-scored LM and the d53 reference-LM filter so the bigram
    * definition cannot drift between them. */
  private def docBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks)-2),
          g -> struct(toks[g] AS w1, toks[g+1] AS w2))""")).as("b"))
      .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
  }

  /** Corpus-bigram language-model quality score — the perplexity-filter
    * shape of a training-data pipeline, with the LM trained on the
    * corpus itself: P(w2|w1) = c(w1,w2)/c(w1·) over all bigram
    * occurrences, and each document scores the average negative
    * log-likelihood of its bigrams (lower = more typical text).
    *
    * Scale design: bigram and unigram count tables are plain hash-aggs;
    * the score join keys on the bigram — the same shuffle the count
    * needed, so Catalyst reuses the exchange. Determinism across
    * engines: each bigram's ln(c1/c2) is rounded ONCE to integer
    * micro-nats (one double op, identical in both engines to well below
    * the rounding grain), then summed as exact int64 — the per-doc sum
    * never depends on float summation order — and the final per-doc
    * average rounds in exact integer arithmetic like [[qualityScore]]. */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = docBigrams(spark, sfDir)
    val c2 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
    big.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("micro_nll",
        round(log($"c1" / $"c2".cast("double")) * 1e6, 0).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"micro_nll").as("sum_micro"))
      // avg_nll to 4 dp: value = num/den with num = sum_micro,
      // den = n·10⁶; round half-up in exact integer space:
      // round(10⁴·num/den) = (2·10⁴·num + den) div (2·den)
      .select($"doc_id", $"n_bigrams",
        (call_function("div",
          $"sum_micro" * 20000L + $"n_bigrams" * 1000000L,
          $"n_bigrams" * 2000000L) / 10000.0).as("avg_nll"))
      .orderBy($"doc_id")
  }

  /** d53 keep threshold (avg reference-LM nll in nats/bigram): docs
    * scoring above it are flagged for drop. The knob a deployment
    * tunes against held-out data; chosen at the fixture's score median
    * so both flag values occur at every fixture SF. (The synthetic
    * fixture draws every "language" from one shared vocabulary, so
    * scores cluster tightly — on a real corpus the en-reference LM
    * separates languages by whole nats and the threshold is lax.) */
  private[graft] val RefLmKeepNll = 3.4

  /** d53: reference-LM quality filter — the CCNet-style gate: score
    * EVERY document's bigram cross-entropy under an LM trained only on
    * a TRUSTED REFERENCE slice (the 'en' documents — the
    * target-language-wiki stand-in), and keep docs under
    * [[RefLmKeepNll]] nats/bigram. Unlike d16 (each doc scored by the
    * corpus's own statistics — no out-of-vocabulary possible), the
    * reference LM must handle bigrams it never saw: add-one (Laplace)
    * smoothing, p(w2|w1) = (c2+1)/(c1+V) with V = reference bigram-head
    * vocabulary size, so an unseen continuation costs ln(c1+V) and a
    * fully-OOV head costs ln(V) — the smoothing that makes the score a
    * total function of the corpus.
    *
    * Determinism: like d16, per-bigram nll is frozen to integer
    * micro-nats (round(ln(rational)·10⁶) — both engines' libm agree
    * through the 6th decimal on these magnitudes, the d16 precedent),
    * summed exactly, averaged via the integer half-up division; the
    * keep flag compares the exact 4-decimal average to the literal.
    *
    * Scale design: reference counts (c2, c1, V) are REFERENCE-sized —
    * a trusted slice is orders smaller than the corpus, so on a
    * cluster they broadcast (here AQE does it) and scoring is map-side
    * over one corpus-bigram exchange; the per-doc rollup rides the
    * same doc_id key. The corpus is never self-joined; adding a
    * document to the corpus (not the reference) changes only its own
    * score — the incremental property a rolling curation pipeline
    * needs. */
  def referenceLmFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = docBigrams(spark, sfDir)
    val refBig = big.join(
      Tables.documents(spark, sfDir).filter($"lang" === "en")
        .select($"doc_id"), Seq("doc_id"), "left_semi")
    val c2 = refBig.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = refBig.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val v = refBig.agg(countDistinct($"w1").as("v"))
    big.join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("micro_nll",
        round(log((coalesce($"c1", lit(0L)) + $"v") /
          (coalesce($"c2", lit(0L)) + 1L).cast("double")) * 1e6, 0)
          .cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"micro_nll").as("sum_micro"))
      .select($"doc_id", $"n_bigrams",
        (call_function("div",
          $"sum_micro" * 20000L + $"n_bigrams" * 1000000L,
          $"n_bigrams" * 2000000L) / 10000.0).as("avg_nll"))
      .withColumn("kept", $"avg_nll" <= RefLmKeepNll)
      .orderBy($"doc_id")
  }

  /** Training-sequence packing: concatenate documents in deterministic
    * order and chunk the token stream into fixed-capacity context
    * windows (2048 tokens) — the "concat and chunk" packing every LLM
    * trainer runs between curation and tokenized shards. A document's
    * sequence is the window containing its FIRST token (greedy
    * concatenation; long docs may span boundaries, as in real packing).
    *
    * Scale design: packing is inherently sequential, so the unit of
    * sequentiality is the SHARD (`source` here) — each shard packs
    * independently under one window partition, which is exactly how a
    * cluster job lays out shard-parallel packing; no global sort, no
    * driver loop, pure integer arithmetic (no float risk). */
  /** Packing core over any (doc_id, source, n_tok) table — split out so
    * boundary shapes the fixture lacks (docs longer than the window)
    * are unit-testable. */
  private[graft] def packCore(docs: DataFrame, cap: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("seq_id", call_function("div", $"cum" - $"n_tok", lit(cap)))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"seq_id")
  }

  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    packCore(docsWithToks(spark, sfDir)
      .select($"doc_id", $"source", size($"toks").cast("long").as("n_tok")),
      2048L)
  }

  /** Gopher-style repetition signals: per document, the duplicate
    * fraction of 3-gram occurrences and the highest single 2-gram
    * repeat count — the standard repetitive-text quality filters.
    * All counting is within-document (explode + per-doc hash-agg on a
    * (doc, gram) key — the gram space is sharded by doc, so there is no
    * hot-key skew at any corpus size), and the ratios round in exact
    * integer arithmetic like [[qualityScore]]. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = docsWithToks(spark, sfDir).filter(size($"toks") >= 3)
    val g3 = toks.select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks)-3),
          g -> concat_ws(' ', toks[g], toks[g+1], toks[g+2]))""")).as("g"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_3grams"),
        countDistinct($"g").as("n_distinct_3grams"))
    val g2top = toks.select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks)-2),
          g -> concat_ws(' ', toks[g], toks[g+1]))""")).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_2gram_count"))
    g3.join(g2top, "doc_id")
      .select($"doc_id", $"n_3grams", $"n_distinct_3grams",
        r4($"n_3grams" - $"n_distinct_3grams", $"n_3grams")
          .as("dup_3gram_frac"),
        $"top_2gram_count")
      .orderBy($"doc_id")
  }

  /** Training-mix weights: per-source token share and the resampling
    * weight that would equalize the mix (weight = uniform-target share
    * over actual share) — the static data-mixing computation behind
    * every corpus recipe. One hash-agg plus a broadcast one-row totals
    * join; shares and weights are rationals rounded in exact integer
    * arithmetic (see [[qualityScore]]), so both engines agree bit-
    * for-bit. */
  def mixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perSource = docsWithToks(spark, sfDir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size($"toks")).cast("long").as("n_tokens"))
    val totals = perSource.agg(
      sum($"n_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select($"source", $"n_docs", $"n_tokens",
        r4($"n_tokens", $"total_tokens").as("token_share"),
        // weight = (total/n_sources) / n_tokens = total / (n_sources·n_tokens)
        r4($"total_tokens", $"n_sources" * $"n_tokens").as("uniform_weight"))
      .orderBy($"source")
  }

  /** Duplicate clusters: connected components over the MinHash near-dup
    * pair graph (see [[Graph.connectedComponents]] for the
    * min-label-propagation scale design). Cluster id = min doc_id in
    * the component, the representative a dedup pass would keep. */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // session-cache the RESULT (one row per clustered doc — bounded by
    // the dup structure, tiny): three consumers (d12, d27's drop list,
    // d40's capstone) would otherwise each re-run the whole
    // connected-components iteration ladder
    cached(spark, sfDir, "dup_clusters") {
      Graph.connectedComponents(lshPairs(spark, sfDir).select($"d1", $"d2"))
        .select($"id".as("doc_id"), $"cluster_id")
    }.orderBy($"doc_id")
  }

  /** Cross-source duplication matrix: how many near-dup pairs link
    * each (source, source) combination — the diagnostic that decides
    * which corpus sources to drop or down-weight before training (a
    * source that mostly duplicates another contributes tokens but no
    * diversity). Reuses the session-cached d06 pair table, so the
    * marginal cost is two joins against the 2-column doc→source map
    * and a tiny aggregation; source pairs are canonically ordered
    * (least, greatest) so A→B and B→A collapse. */
  def crossSourceDups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, sfDir).select($"doc_id", $"source")
    lshPairs(spark, sfDir)
      .join(src.select($"doc_id".as("d1"), $"source".as("s1")), "d1")
      .join(src.select($"doc_id".as("d2"), $"source".as("s2")), "d2")
      .select(least($"s1", $"s2").as("src_a"),
        greatest($"s1", $"s2").as("src_b"))
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"src_a", $"src_b")
  }

  /** d25: exact shared-substring detection (the "Deduplicating Training
    * Data Makes Language Models Better" shape): for every document pair
    * sharing at least one 8-token window, report the LONGEST contiguous
    * shared token run and the total shared-window count. Rolling
    * stride-1 windows hash to int64; windows shared by a pair at
    * positions (pa, pb) belong to one contiguous run iff they sit on
    * the same diagonal (pa−pb) at consecutive pa — the classic
    * gaps-and-islands grouping `pa − row_number()`.
    *
    * Scale design: windows travel as xxhash64 int64s (never the token
    * strings); a document-frequency cap (≤ [[SubDfCap]] docs) drops
    * boilerplate windows BEFORE the pair self-join, which is what keeps
    * the join linear-ish at corpus scale — a window shared by a million
    * docs is boilerplate (d24's territory), not substring duplication,
    * and would otherwise contribute O(df²) pairs. The run grouping
    * shuffles by (doc_a, doc_b) — bounded by the true near-dup pair
    * count, not the corpus size. Collision risk of the 64-bit window
    * hash is the same corpus-scale bound documented at
    * [[decontaminate]] (~n²/2⁶⁴; switch both sides to a 128-bit hash
    * pair if a trillion-window corpus needs it). */
  private val SubW = 8
  private val SubDfCap = 20
  def sharedSubstrings(spark: SparkSession, sfDir: String): DataFrame =
    sharedSubstringsCore(docsWithToks(spark, sfDir))

  private[graft] def sharedSubstringsCore(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = docs
      .filter(size($"toks") >= SubW)
      .select($"doc_id", posexplode(expr(
        s"""transform(sequence(0, size(toks)-$SubW),
           i -> xxhash64(concat_ws(' ', slice(toks, i+1, $SubW))))"""))
        .as(Seq("pos", "h")))
    // ONE shuffle of the window table: gather each window's (doc, pos)
    // occurrence list and expand ordered pairs in place — the corpus is
    // never hashed twice and never self-joined. Singleton windows
    // (one distinct doc — can never pair) and boilerplate windows
    // (> SubDfCap distinct docs) prune inside the same aggregation.
    // Per-window list size is bounded by the df cap × within-doc
    // repeats, so the m² pair expansion is a small map-side loop.
    val p = w.groupBy($"h")
      .agg(collect_list(struct($"doc_id", $"pos")).as("occ"),
        countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2 && $"nd" <= SubDfCap)
      .select(explode(expr(
        """flatten(transform(occ, a ->
             transform(filter(occ, b -> b.doc_id > a.doc_id),
               b -> struct(a.doc_id AS da, b.doc_id AS db,
                 a.pos AS pa, b.pos AS pb))))""")).as("pr"))
      .select($"pr.da", $"pr.db", $"pr.pa", $"pr.pb")
    val runs = p
      .withColumn("diag", $"pa" - $"pb")
      .withColumn("grp", $"pa" - row_number().over(
        Window.partitionBy($"da", $"db", $"diag").orderBy($"pa")))
      .groupBy($"da", $"db", $"diag", $"grp")
      .agg(count(lit(1)).as("nwin"))
    runs.groupBy($"da", $"db")
      .agg((max($"nwin") + lit(SubW - 1L)).as("longest_tokens"),
        sum($"nwin").as("n_windows"))
      .orderBy($"da", $"db")
  }

  /** d26: per-document token-distribution Shannon entropy (nats) — the
    * "repetitive junk" quality signal a pretraining filter thresholds
    * low (a doc that is one token repeated has entropy 0; rich text
    * approaches ln(n_types)). H = Σ (c_i/n)·ln(n/c_i) over the doc's
    * token counts.
    *
    * Determinism across engines: like [[bigramLm]], each type's
    * ln(n/c_i) is rounded ONCE to integer micro-nats (one double op,
    * identical in both engines to well below the grain), weighted by
    * the exact integer count c_i, summed as exact int64, and the final
    * per-doc average rounds in exact integer arithmetic — no
    * order-dependent float summation anywhere.
    *
    * Scale design: two chained hash-aggs — (doc, token) counts, then
    * per-doc roll-up — both map-side combined; the second groupBy and
    * the count join reuse the doc_id-prefixed exchange. No windows, no
    * joins wider than doc_id. */
  def tokenEntropy(spark: SparkSession, sfDir: String): DataFrame =
    tokenEntropyCore(docsWithToks(spark, sfDir))

  private[graft] def tokenEntropyCore(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cnt = docs
      .select($"doc_id", explode($"toks").as("tok"))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("c"))
    val n = cnt.groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_types"))
    cnt.join(n, "doc_id")
      .withColumn("wmicro",
        $"c" * round(log($"n" / $"c".cast("double")) * 1e6).cast("long"))
      .groupBy($"doc_id")
      .agg(first($"n").as("n_tokens"), first($"n_types").as("n_types"),
        sum($"wmicro").as("sm"))
      .select($"doc_id", $"n_tokens", $"n_types",
        (call_function("div",
          $"sm" * 20000L + $"n_tokens" * 1000000L,
          $"n_tokens" * 2000000L) / 10000.0).as("entropy"))
      .orderBy($"doc_id")
  }

  /** Fixed keyword workload for d28 — terms drawn from the fixture
    * vocabulary; a retrieval benchmark's query set is a bounded literal
    * input, never data-dependent. */
  private[graft] val Bm25Terms = Seq("spark", "join", "vector", "customer", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** d28: BM25 keyword retrieval — top-5 documents per query term under
    * the Okapi BM25 ranking function (k1=1.2, b=0.75, the
    * Robertson/Sparck-Jones idf in its always-positive `ln(1 + …)`
    * form). The inverted-index scoring pass of a search engine,
    * expressed relationally: tf per (term, doc), df per term, doc
    * length vs corpus average for length normalization.
    *
    * Scale design: the term filter lands directly on the exploded token
    * stream, so only postings of the 5 query terms survive the first
    * hash-agg (at 100 TB: the posting lists, not the corpus, get
    * shuffled); doc lengths are a second map-side-combined hash-agg;
    * corpus totals (N, Σdl) and per-term df are single-row/5-row
    * broadcasts. Per-term top-5 is a window over ≤ df rows partitioned
    * by term — at scale the [[graft.functions.TopKAggregator]] bounded
    * buffer (v11) would replace the window; df here is fixture-small.
    *
    * Cross-engine determinism: tf, df, dl, N, Σdl are exact integers;
    * the score is a handful of double ops on those integers with
    * literal constants, rounded once to 1e-4 — same residual risk class
    * as d09/d16 (a value within 1 ulp of a rounding boundary could
    * differ; accepted there, accepted here). Rank ties break on doc_id
    * over the ROUNDED score, so both engines rank identically. */
  /** The BM25 scored table (doc_id, term, score) — shared by d28's
    * ranking and v17's retrieve-then-expand seed selection
    * ([[graft.operators.VectorOps]]); mirrors [[bm25Cte]]. */
  private[graft] def bm25Scored(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = docsWithToks(spark, sfDir)
    val dl = toks.select($"doc_id", size($"toks").cast("long").as("dl"))
    val totals = dl.agg(sum($"dl").as("sum_dl"),
      count(lit(1)).as("n_docs"))
    val tf = toks.select($"doc_id", explode($"toks").as("term"))
      .filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id")
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("score", round(
        $"idf" * ($"tf" * lit(Bm25K1 + 1.0)) /
          ($"tf" + lit(Bm25K1) * (lit(1.0 - Bm25B) +
            lit(Bm25B) * $"dl" * $"n_docs" / $"sum_dl")), 4))
  }

  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bm25Scored(spark, sfDir)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"term").orderBy(desc("score"), $"doc_id")))
      .filter($"rank" <= 5)
      .select($"term", $"rank".cast("long").as("rank"), $"doc_id", $"score")
      .orderBy($"term", $"rank")
  }

  /** d29: PageRank over the document similarity graph (nodes = all
    * docs, undirected edges = the d06 LSH near-dup pairs) — the graph
    * centrality a curation pipeline uses to pick the CANONICAL copy of
    * a duplicated document: highly-replicated content accumulates rank.
    * Five power iterations, damping 0.85.
    *
    * Cross-engine determinism, by construction rather than tolerance:
    * ranks are INTEGER pico-units (10¹² ≈ total mass), every update is
    * integer arithmetic — r₀ = 10¹²÷N, per-edge contribution
    * r÷deg, next r = (15·(10¹²÷N))÷100 + (85·Σcontrib)÷100 with ÷ =
    * floor division — so both engines produce bit-identical BIGINTs;
    * no float summation order anywhere. The oracle unrolls the five
    * iterations as CTEs over the same shared band/pair chain.
    *
    * Scale design: the edge list with degrees is checkpointed once and
    * re-joined per iteration; each iteration is one shuffled
    * contribution aggregation + one left join back to the node set —
    * the [[Graph.connectedComponents]] loop shape with a fixed
    * iteration count, linear per iteration in |E|. Ranks are
    * checkpointed per iteration so the plan never grows with the loop.
    * The only driver-side values are N (one count) and the two derived
    * Long constants. */
  def pageRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id")
    val n = docs.count()
    val unit = 1000000000000L / n
    val base = 15L * unit / 100L
    val pairs = lshPairs(spark, sfDir).select($"d1", $"d2")
    val edges = pairs.select($"d1".as("src"), $"d2".as("dst"))
      .union(pairs.select($"d2".as("src"), $"d1".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src").localCheckpoint()
    var ranks = docs.select($"doc_id", lit(unit).as("r")).localCheckpoint()
    for (_ <- 1 to 5) {
      val contrib = ed.join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select($"dst", expr("r div deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      ranks = docs
        .join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select($"doc_id",
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.select($"doc_id", $"r".as("rank_pico")).orderBy($"doc_id")
  }

  /** d30: corpus-order novelty scoring — per document, the fraction of
    * its distinct 3-token shingles that NO earlier document (smaller
    * doc_id = earlier ingest) contains. The freshness signal an
    * incremental ingest pipeline tracks as it appends data: a crawl
    * whose novelty trend decays is re-crawling what the corpus already
    * holds. Complements s24 (which flags near-dup DOCS incrementally;
    * this measures marginal n-gram-level information).
    *
    * Scale design: one exploded distinct-shingle table feeds a
    * min(doc_id) hash-agg (the "first owner" of each shingle) and the
    * per-doc roll-up joins back ON THE SHINGLE KEY — the join reuses
    * the agg's exchange, so the pipeline is two map-side-combined aggs
    * + one co-partitioned join. Novelty ratio rounds in exact integer
    * rational arithmetic ([[graft.functions.Det.r4]]). */
  /** One row per (doc, distinct 3-token shingle) — the raw-string
    * shingle table shared by d30 and the s26 streaming novelty
    * ([[graft.streaming.StreamOps]]), so the shingle definition cannot
    * drift between the batch and streaming contracts. */
  private[graft] def distinctShingles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> concat_ws(' ', toks[g], toks[g+1], toks[g+2])))""")).as("s"))
  }

  def noveltyScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // first-owner via ONE window over the shingle-partitioned table —
    // the d08 document-frequency lesson: the min-agg + join-back
    // alternative pays the (map-side) shingle explode TWICE and
    // shuffles the shingle table by s twice (agg + join); the window
    // rides a single exchange (measured ~35% off d30's sf0.1 wall)
    val sh = distinctShingles(spark, sfDir)
    sh.withColumn("first_doc",
        min($"doc_id").over(Window.partitionBy($"s")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        r4($"n_novel", $"n_grams").as("novelty"))
      .orderBy($"doc_id")
  }

  /** How many of the global top terms to track per source in d43 —
    * the bounded vocabulary that makes distribution drift a broadcast
    * problem instead of a full-vocabulary shuffle. */
  private[graft] val DriftTerms = 100

  /** d43: token-distribution drift per source — the mixture-monitoring
    * op a training-data pipeline runs when a new crawl snapshot lands:
    * "which source's language has moved away from the corpus mix, and
    * on which words?" Per source, total-variation-style distance
    * between the source's term distribution and the corpus-wide one,
    * over the global top-[[DriftTerms]] terms (the bounded head; the
    * tail is noise for drift purposes), plus the single most drifted
    * term.
    *
    * Determinism: rates are exact integer parts-per-billion via
    * [[Det.fdiv]] (tf·10⁹ ≤ 10⁹·corpus-tokens stays well inside
    * BIGINT), the distance is a plain BIGINT sum of absolute rate
    * differences, and the arg-max term breaks ties lexicographically.
    *
    * Scale design: one exchange builds (source, term) counts; term
    * totals re-aggregate those partials map-side; the top-100 term set
    * and the per-source token totals are tiny broadcasts, so the
    * source×term drift grid (n_sources × 100 rows) never shuffles the
    * corpus again. At 100 TB the only big job is the first token
    * count — exactly the d02 shape. */
  def sourceDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = docsWithToks(spark, sfDir)
      .select($"source", explode($"toks").as("term"))
    // st is referenced four times below (per-source totals, term totals,
    // the grid probe, the corpus total); localCheckpoint materializes the
    // vocab-sized aggregate once so the corpus explode+count runs exactly
    // one scan — AQE exchange reuse only deduplicated 2 of the 4
    val st = tok.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val totSrc = st.groupBy($"source").agg(sum($"tf").as("tot_src"))
    val termTot = st.groupBy($"term").agg(sum($"tf").as("tf_all"))
    val top = termTot.orderBy($"tf_all".desc, $"term").limit(DriftTerms)
    val grid = broadcast(totSrc).crossJoin(broadcast(top))
      .join(st, Seq("source", "term"), "left")
      .na.fill(0L, Seq("tf"))
      .crossJoin(broadcast(termTot.agg(sum($"tf_all").as("tot_all"))))
      .withColumn("diff_ppb", abs(
        Det.fdiv($"tf" * 1000000000L, $"tot_src") -
          Det.fdiv($"tf_all" * 1000000000L, $"tot_all")))
    grid
      .withColumn("rn", row_number().over(Window.partitionBy($"source")
        .orderBy($"diff_ppb".desc, $"term")))
      .withColumn("drift_ppb",
        sum($"diff_ppb").over(Window.partitionBy($"source")))
      .filter($"rn" === 1)
      .select($"source", $"tot_src".as("total_tokens"), $"drift_ppb",
        $"term".as("top_term"), $"diff_ppb".as("top_term_ppb"))
      .orderBy($"source")
  }

  /** d44: bigram-coverage quality score — the n-gram-LM-lite fluency
    * filter (the CCNet/Gopher-style "does this document look like the
    * corpus head?" signal without transcendental math): the corpus's
    * top-200 word bigrams form the head model, and each document is
    * scored by the fraction of ITS bigrams that land in that head.
    * Low coverage flags boilerplate, shuffled-token spam, and
    * out-of-domain text; unlike a real LM perplexity it is exactly
    * reproducible across engines (pure counting + one rational
    * rounding — no log/exp whose last-ulp behavior differs).
    *
    * Scale design: pass 1 is a two-level hash-agg (map-side combine
    * collapses each partition's bigram counts before ONE shuffle) +
    * a 200-row TakeOrdered to the driver; pass 2 broadcast-joins that
    * 200-row head to the corpus bigrams — the corpus never shuffles
    * on the bigram key, and per-doc aggregation shuffles on doc_id
    * only. At 100 TB the head stays 200 rows: both passes are scans. */
  def bigramCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bi = docsWithToks(spark, sfDir)
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-1), i -> concat(toks[i-1], ' ', toks[i]))"))
        .as("bigram"))
    val head = bi.groupBy($"bigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), $"bigram").limit(200)
      .select($"bigram", lit(1).as("hit"))
    bi.join(broadcast(head), Seq("bigram"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce($"hit", lit(0))).cast("long").as("covered"))
      .withColumn("coverage", Det.r4($"covered", $"n_bigrams"))
      .orderBy($"doc_id")
  }

  /** d45: sliding-window chunking with overlap — the ingest step every
    * RAG / long-context training pipeline runs before embedding: each
    * document splits into 32-token chunks on a 16-token stride (50%
    * overlap so no boundary sentence is lost), each chunk carrying its
    * provenance (doc_id, index, token offset) and a content hash for
    * downstream chunk-level dedup. Tail chunks keep their natural
    * (shorter) length — the deterministic naive contract, identical in
    * both engines' clamped list slicing.
    *
    * Scale design: chunk generation is a map-side explode of a
    * per-doc index sequence (⌈n/stride⌉ rows per doc — no shuffle,
    * no self-join); the only exchange is the output ordering. At
    * 100 TB this is a pure scan whose output feeds the embedding
    * stage partitioned however that stage needs. */
  def chunkOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val C = ChunkLen; val S = ChunkStride
    docsWithToks(spark, sfDir)
      .withColumn("n", size($"toks"))
      .select($"doc_id", $"toks",
        explode(expr(s"sequence(0, cast((n - 1) / $S AS int))")).as("i"))
      .withColumn("start_tok", ($"i" * S).cast("long"))
      .withColumn("chunk", expr(s"slice(toks, start_tok + 1, $C)"))
      .select($"doc_id", $"i".cast("long").as("chunk_idx"), $"start_tok",
        size($"chunk").cast("long").as("n_tok"),
        md5(concat_ws(" ", $"chunk")).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** d56 banding constants: each FULL 32-token chunk splits into
    * [[ChunkSubN]] positional [[ChunkSub]]-token sub-chunks; a chunk
    * pair is a near-dup if ≥ [[ChunkMinPos]] same-position sub-hashes
    * match (tolerates edits confined to the other sub-chunks — the
    * SimHash segment-banding pigeonhole at chunk granularity); a
    * (pos, sub-hash) bucket holding more than [[ChunkDfCap]] chunks is
    * excluded (the d46 df-cap discipline: skew bound + boilerplate
    * attractors are exactly the buckets that would chain unrelated
    * text). */
  private[graft] val ChunkSub = 8
  private[graft] val ChunkSubN = 4
  private[graft] val ChunkMinPos = 2
  private[graft] val ChunkDfCap = 50L

  /** d56: CHUNK-LEVEL near-dup with DOC-LEVEL rollup — the
    * fine-grained dedup shape fine-data pipelines actually run (the
    * C4/RefinedWeb paragraph-dedup): whole-doc near-dup (d06) and
    * containment (d46) bracket it but neither says HOW MUCH of each
    * document is duplicated text. Over d45's chunk grid (32-token
    * windows, 16-token stride — the shared `chunkCte` text), each FULL
    * chunk's 4 positional 8-token sub-hashes are banded; chunks of
    * DIFFERENT documents matching on ≥ 2 positions are near-dup
    * chunk pairs (cross-doc only — intra-doc repetition is d18's
    * statistic, and the 50%-overlapping grid would trivially self-match
    * neighbors); the per-doc rollup reports the fraction of full
    * chunks with any cross-doc near-match and the keep/trim decision
    * (trim when more than half the doc is duplicated text — the
    * integer comparison n_dup·2 > n_chunks, no float threshold).
    *
    * Scale design: the candidate generator is banded AND df-capped —
    * every (pos, sub-hash) bucket holds ≤ [[ChunkDfCap]] chunks, so
    * candidate volume is Σ min(df, cap)² per bucket, NEVER chunk-pairs²
    * (the 100× probe pins the slope); the rollup joins flagged chunks
    * back on the (doc, chunk) key the grid already carries. Sub-hashes
    * travel as md5 strings of 8-token windows — one codegen'd pass,
    * no self-join before the bucket cap. */
  def chunkDupRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val chunks = docsWithToks(spark, sfDir)
      .withColumn("n", size($"toks"))
      .select($"doc_id", $"toks",
        explode(expr(s"sequence(0, cast((n - 1) / $ChunkStride AS int))"))
          .as("i"))
      .withColumn("chunk",
        expr(s"slice(toks, i * $ChunkStride + 1, $ChunkLen)"))
      .filter(size($"chunk") === ChunkLen)
      .select($"doc_id", $"i".cast("long").as("chunk_idx"), $"chunk")
    val subs = chunks.select($"doc_id", $"chunk_idx",
      posexplode(expr(
        s"""transform(sequence(0, ${ChunkSubN - 1}),
           j -> md5(concat_ws(' ', slice(chunk, j * $ChunkSub + 1, $ChunkSub))))"""))
        .as(Seq("pos", "sh")))
    val rare = subs.join(
      subs.groupBy($"pos", $"sh").agg(count(lit(1)).as("dfc"))
        .filter($"dfc" <= ChunkDfCap),
      Seq("pos", "sh"))
    val pairs = rare.as("a")
      .join(rare.as("b"),
        col("a.pos") === col("b.pos") && col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("a.chunk_idx").as("c1"),
        col("b.doc_id").as("d2"), col("b.chunk_idx").as("c2"))
      .agg(count(lit(1)).as("npos"))
      .filter($"npos" >= ChunkMinPos)
    val flagged = pairs.select($"d1".as("doc_id"), $"c1".as("chunk_idx"))
      .union(pairs.select($"d2".as("doc_id"), $"c2".as("chunk_idx")))
      .distinct()
      .withColumn("dup", lit(1L))
    chunks.select($"doc_id", $"chunk_idx")
      .join(flagged, Seq("doc_id", "chunk_idx"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce($"dup", lit(0L))).as("n_dup"))
      .select($"doc_id", $"n_chunks", $"n_dup",
        r4($"n_dup", $"n_chunks").as("dup_frac"),
        when($"n_dup" * 2L > $"n_chunks", "trim").otherwise("keep")
          .as("action"))
      .orderBy($"doc_id")
  }

  /** The d45/d56 chunk-grid geometry — ONE pair of constants shared by
    * the chunker, the rollup, and both oracle texts. */
  private[graft] val ChunkLen = 32
  private[graft] val ChunkStride = 16

  /** Containment (overlap-coefficient) threshold and the rare-shingle
    * document-frequency cap that defines d46's candidate contract. */
  private val ContainDfCap = 50L

  /** d46: sub-document containment — partial duplication that Jaccard
    * dedup (d06/d08) is BLIND to: a short document wholly quoted inside
    * a much longer one has overlap coefficient |A∩B|/min(|A|,|B|) ≈ 1
    * but Jaccard ≈ |A|/|B| ≈ 0, so it collides in no MinHash band.
    * Contract: pairs sharing at least one RARE 3-shingle (corpus df ≤
    * 50 — the d37 posting-cap discipline, here doubling as the skew
    * bound) whose exact overlap coefficient is ≥ 0.8, with the Jaccard
    * alongside so a consumer sees which pairs plain near-dup would have
    * caught. The df cap is part of the declared contract: containment
    * evidence lives in rare shingles; boilerplate shingles (df > cap)
    * are exactly the ones that would chain unrelated documents.
    *
    * Scale design: the candidate self-join keys on rare shingles only,
    * so every bucket holds ≤ cap docs (≤ cap² pairs per shingle) — the
    * unbounded-bucket skew of a full shingle join cannot occur. Exact
    * verification touches candidates only: one codegen'd sorted-array
    * intersection over the per-doc hash sets (the d08 verify shape).
    * Threshold test is the cross-multiplied integer predicate 5·common
    * ≥ 4·min(n1,n2) — no double compare. Like every pair-emitting op
    * here, output is c² per duplicate group (see the d08/SURVEY §6
    * caveat); the cluster-emitting composition canonicalizes first.
    *
    * COLLISION CAVEAT: shingle sets are xxhash64 values, not raw
    * strings, so two DISTINCT shingles colliding in 64 bits would
    * inflate `common` / shrink n (and diverge from a raw-string
    * oracle). Birthday bound: P(any collision) ≈ m²/2⁶⁵ for m distinct
    * corpus shingles — negligible at fixture scale, ~3% at m = 10¹⁰
    * (a 100 TB corpus). The d08 Jaccard path carries the same caveat.
    * At that scale either accept the ppb-level per-pair error (each
    * collision perturbs one count by 1; the 0.8 threshold is not
    * knife-edge) or confirm candidates on raw shingles in the verify
    * join — the candidate generator is unaffected (a collision only
    * ADDS a candidate pair, which exact verify then rejects). */
  def containmentDups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    val sh = cached(spark, sfDir, "d46_sh") {
      docsWithToks(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(0, size(toks)-3),
            g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy($"h")))
    }
    val byDoc = cached(spark, sfDir, "d46_bydoc") {
      sh.groupBy($"doc_id")
        .agg(sort_array(collect_list($"h")).as("hs"),
          count(lit(1)).as("n"))
    }
    val rare = sh.filter($"df" <= ContainDfCap).select($"doc_id", $"h")
    // dedup BEFORE verify here (unlike d08): a contained pair shares
    // every rare shingle of the smaller doc, so candidate multiplicity
    // is ~doc-length — one exchange over the slim pair list beats
    // hundreds of redundant array intersections per pair
    val cand = rare.as("a")
      .join(rare.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    cand
      .join(byDoc.select($"doc_id".as("d1"), $"hs".as("h1"), $"n".as("n1")), "d1")
      .join(byDoc.select($"doc_id".as("d2"), $"hs".as("h2"), $"n".as("n2")), "d2")
      .withColumn("common",
        call_function("graft_sorted_isect", $"h1", $"h2").cast("long"))
      .filter($"common" * 5L >= least($"n1", $"n2") * 4L)
      .select($"d1", $"d2", $"n1", $"n2", $"common",
        r4($"common", least($"n1", $"n2")).as("containment"),
        r4($"common", $"n1" + $"n2" - $"common").as("jaccard"))
      .orderBy($"d1", $"d2")
  }

  /** d47: hashed linear quality classifier — the fastText/CCNet-style
    * model-based filter shape: every token hashes into one of 64
    * feature buckets, each bucket carries a fixed integer weight (here
    * a closed-form LCG of the bucket id standing in for trained
    * weights; a production run broadcasts the real weight vector), the
    * document's margin is the mean token weight and the keep decision
    * is its sign. The point is the EXECUTION shape of model scoring at
    * corpus scale, with a deterministic stand-in model both engines
    * can agree on bit-exactly.
    *
    * Determinism: one codegen'd md5 per token occurrence (the
    * [[minhashSigs]] measurement: beats interpreted per-element
    * lambdas), bucket/weight are pure int64 arithmetic on non-negative
    * operands, the margin is the r4 exact rational Σw / (1000·n).
    *
    * Scale design: scoring is map work; the only exchange is the
    * per-doc hash-agg, collapsed map-side to one row per document per
    * partition before shuffling — |docs| rows move, never |tokens|. */
  def classifierScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsWithToks(spark, sfDir)
      .select($"doc_id", explode($"toks").as("t"))
      .withColumn("b",
        expr("conv(substr(md5(t), 1, 8), 16, 10)").cast("long") % 64L)
      .withColumn("w",
        (lit(2654435761L) * $"b" + lit(1013904223L)) % 2001L - 1000L)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"w").as("sum_w"))
      .select($"doc_id", $"n_tokens", $"sum_w",
        r4($"sum_w", $"n_tokens" * 1000L).as("score"),
        ($"sum_w" > 0L).as("kept"))
      .orderBy($"doc_id")
  }

  /** d49: corpus snapshot diff — the incremental-ingest planning step:
    * given the previous and current snapshot of a keyed corpus, which
    * documents were ADDED, REMOVED, or CHANGED (content hash differs),
    * and how much re-embedding/re-indexing work that implies (changed +
    * added character volume). The fixture stands the two snapshots up
    * deterministically so all four statuses occur: the OLD snapshot
    * holds docs with id % 5 ≠ 4 (original text), the NEW one docs with
    * id % 7 ≠ 6, where docs with id % 3 = 0 carry an edited text
    * (suffix marker) — so removed/added/changed/unchanged are all
    * non-empty and the diff logic is what is under test. Output:
    * per-status doc counts and char volumes plus the per-status min
    * key as a spot-check anchor.
    *
    * Scale design: the diff is ONE full-outer hash join on the snapshot
    * key (both sides pre-collapsed to (key, md5, chars) map-side — the
    * text column never shuffles), then a ≤4-row status rollup. At
    * 100 TB this is the shape that decides how much of the embedding/
    * index pipeline reruns — the whole point of keying corpora. */
  /** d49/s39 synthetic-snapshot split rules — ONE definition for the
    * batch diff, the streaming CDC changelog builder, and both oracle
    * strings (drift-proof literals). */
  private[graft] val SnapOldMod = 5L   // in OLD iff k % 5 ≠ 4
  private[graft] val SnapNewMod = 7L   // in NEW iff k % 7 ≠ 6
  private[graft] val SnapEditMod = 3L  // NEW text edited iff k % 3 = 0

  /** The old/new snapshot projections (k, h, chars) — shared by the
    * d49 batch join and the s39 streaming changelog builder. */
  private[graft] def snapshotSides(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as("k"), $"text",
        $"n_chars".cast("long").as("n_chars"))
    val old = docs.filter($"k" % SnapOldMod =!= (SnapOldMod - 1))
      .select($"k", md5($"text").as("h"), $"n_chars".as("chars"))
    val nw = docs.filter($"k" % SnapNewMod =!= (SnapNewMod - 1))
      .select($"k",
        md5(when($"k" % SnapEditMod === 0, concat($"text", lit(" v2")))
          .otherwise($"text")).as("h"),
        (when($"k" % SnapEditMod === 0, $"n_chars" + 3L)
          .otherwise($"n_chars")).as("chars"))
    (old, nw)
  }

  /** The d49 per-status rollup over (k, status, old_chars, new_chars)
    * rows — shared verbatim by the s39 streaming reduction. */
  private[graft] def snapshotDiffReduce(j: DataFrame): DataFrame = {
    import j.sparkSession.implicits._
    j.groupBy($"status")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce($"new_chars", lit(0L))).as("new_chars"),
        sum(coalesce($"old_chars", lit(0L))).as("old_chars"),
        min($"k").as("min_key"))
      .orderBy($"status")
  }

  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (old, nw) = snapshotSides(spark, sfDir)
    snapshotDiffReduce(old
      .select($"k", $"h".as("old_h"), $"chars".as("old_chars"))
      .join(nw.select($"k", $"h".as("new_h"), $"chars".as("new_chars")),
        Seq("k"), "full_outer")
      .withColumn("status",
        when($"old_h".isNull, "added")
          .when($"new_h".isNull, "removed")
          .when($"old_h" === $"new_h", "unchanged")
          .otherwise("changed")))
  }

  /** d52: incremental near-dup — the PRODUCTION dedup shape once a
    * corpus is live: when a batch of new documents lands, find each
    * new doc's near-duplicates against the EXISTING corpus and within
    * the new batch itself, WITHOUT ever re-pairing old×old (that work
    * was done when the old corpus was deduped; redoing it is the
    * difference between an O(new) nightly job and an O(corpus) one).
    * New arrivals are the d49 snapshot rules' "added" set (in NEW,
    * not OLD — shared [[SnapOldMod]]/[[SnapNewMod]] literals, so the
    * incremental split can never drift from the d49/s39 diff), the
    * existing corpus is the OLD snapshot. Output: (d_new, d_match,
    * phase ∈ {corpus, batch}, est_jaccard ≥ 0.5) — d06's MinHash
    * pipeline restricted to pairs touching a new doc. This is the
    * batch face of s24 (which does the same thing one micro-batch at
    * a time against a RocksDB band index).
    *
    * Scale design: both candidate joins probe the SHARED band table
    * ([[lshBands]] — same cache the full d06 run uses): new-batch
    * band rows (≈ |new|·4) hash-join the old corpus's band index on
    * (band, bh) — the cost is driven by the new batch and the bucket
    * hit rate, not corpus size — and the within-batch self-join is
    * |new|-sized. Signature verification joins only candidate ids.
    * At 100 TB corpus + 100 GB daily batch, every shuffle here is
    * batch-sized; the corpus contributes one build-side scan of its
    * band index (on a cluster: a bucketed/stored index, point
    * lookups). */
  def incrementalNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sigs = cached(spark, sfDir, "sigs")(minhashSigs(spark, sfDir))
    val bands = lshBands(spark, sfDir)
    val isOld = col("doc_id") % SnapOldMod =!= (SnapOldMod - 1)
    val isNew = (col("doc_id") % SnapOldMod === (SnapOldMod - 1)) &&
      (col("doc_id") % SnapNewMod =!= (SnapNewMod - 1))
    val oldBands = bands.filter(isOld)
    val newBands = bands.filter(isNew)
    val vsCorpus = newBands.as("a").join(oldBands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh")
      .select($"a.doc_id".as("d_new"), $"b.doc_id".as("d_match"),
        lit("corpus").as("phase"))
    val vsBatch = newBands.as("a").join(newBands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d_new"), $"b.doc_id".as("d_match"),
        lit("batch").as("phase"))
    vsCorpus.unionByName(vsBatch).distinct()
      .join(sigs.select($"doc_id".as("d_new"), $"sig".as("sig_n")), "d_new")
      .join(sigs.select($"doc_id".as("d_match"), $"sig".as("sig_m")),
        "d_match")
      .select($"d_new", $"d_match", $"phase",
        round(expr(
          "size(filter(zip_with(sig_n, sig_m, (x, y) -> x = y), m -> m))")
          / lit(16.0), 4).as("est_jaccard"))
      .filter($"est_jaccard" >= 0.5)
      .orderBy($"d_new", $"d_match")
  }

  /** d54 band layouts over the 16 minhash permutations: (bands,
    * rows-per-band) with b·r = 16 — from high-precision (2 bands of 8:
    * a candidate must match 8 straight permutations) to the degenerate
    * recall-max (16 bands of 1: any shared permutation minimum is a
    * candidate). The deployed d06 layout is (4, 4). */
  private[graft] val BandLayouts = Seq((2, 8), (4, 4), (8, 2), (16, 1))

  /** d54: LSH banding tuning curve — the (b, r) trade-off every
    * MinHash deployment sets, measured instead of guessed: for each
    * [[BandLayouts]] layout over the SAME 16-permutation signatures,
    * the candidate-pair volume (the cost axis: pairs that must be
    * verified) and the candidate recall against d08's exact-Jaccard
    * ≥ 0.5 ground truth (the quality axis). Banding theory says a
    * true pair at similarity s survives with 1-(1-s^r)^b — wider
    * bands (big r) crush the candidate volume but lose borderline
    * pairs, and r = 1 explodes: on the sf0.1 fixture the candidate
    * count runs 236 → 282 → 1 061 → 159 424 across the four layouts.
    * v26 is the same readout for the IVF index (nprobe); this is the
    * dedup-index counterpart.
    *
    * Determinism: exact counts; recall is the r4 exact rational;
    * layouts ride as literals.
    *
    * Scale design: signatures are computed ONCE (the shared d06
    * cache); each layout is one band self-join whose cost IS the
    * measured quantity — the r = 1 row exists precisely to show the
    * blow-up a deployment must avoid (its bucket key is a single
    * permutation minimum, so bucket sizes approach document frequency
    * of the commonest shingle — the curve is how you find that out at
    * sf0.1, not at 100 TB). The truth set rides d08's declared
    * prefix-filtered contract; hit-counting joins only candidate
    * pairs. */
  def bandingCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sigs = cached(spark, sfDir, "sigs")(minhashSigs(spark, sfDir))
    val truth = ngramJaccard(spark, sfDir)
      .select($"d1", $"d2", lit(1L).as("t"))
    val perLayout = BandLayouts.map { case (b, r) =>
      val bands = sigs.select($"doc_id", explode(expr(
        s"""transform(sequence(0, ${b - 1}),
          bb -> struct(bb AS band,
            array_join(transform(slice(sig, bb*$r + 1, $r),
              v -> cast(v as string)), '|') AS bh))""")).as("x"))
        .select($"doc_id", $"x.band".as("band"), $"x.bh".as("bh"))
      bands.as("a")
        .join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
        .join(truth, Seq("d1", "d2"), "left")
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum($"t"), lit(0L)).as("n_hit"))
        .select(lit(b.toLong).as("b"), lit(r.toLong).as("r"),
          $"n_candidates", $"n_hit")
    }
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    perLayout.reduce(_ unionByName _)
      .crossJoin(broadcast(nTruth))
      .select($"b", $"r", $"n_candidates", $"n_hit", $"n_truth",
        graft.functions.Det.r4($"n_hit", $"n_truth").as("recall"))
      .orderBy($"b")
  }

  /** d50: cross-source contamination matrix — the provenance-hygiene
    * report run before mixing crawl snapshots: for every unordered
    * source pair, the number of distinct 3-token shingles present in
    * BOTH sources, each side's distinct shingle count, and the overlap
    * coefficient |A∩B| / min(|A|,|B|) — the containment-style measure
    * that stays meaningful when source sizes differ 100× (1.0 means
    * the smaller source's shingle set is a subset of the larger: a
    * mirror). Complements d21 (which finds cross-source duplicate
    * DOCUMENTS); this measures corpus-level content sharing even when
    * no single document crosses a dedup threshold.
    *
    * Determinism: exact distinct counts; overlap is the r4 exact
    * rational; (src_a, src_b) lexicographic with src_a < src_b.
    *
    * Shingles travel as xxhash64 int64s (the d15/d46 collision bound:
    * a ~2⁻⁶⁵-per-pair birthday collision could merge two shingles —
    * negligible at fixture scale, and at ~10B distinct shingles the
    * documented widening is two independent xxhash64 seeds); the
    * oracle states the same counts over raw shingle strings.
    *
    * Scale design: raw text collapses to DISTINCT (shingle-hash,
    * source) rows in ONE map-side-combined shuffle; per-shingle source
    * sets are ≤ |sources| = 20 by construction so the pair explode is
    * ≤ C(20,2) per shingle — map-side, bounded — and the (src_a,
    * src_b) hash-agg output is the bounded 20×20 triangle; per-source
    * totals are a |sources|-row broadcast. No corpus self-join
    * anywhere; at 10⁴ sources the per-shingle set bound grows and the
    * explode caps at sources-sharing-a-shingle (df-style skew: a
    * shingle in EVERY source costs C(n,2) — prune shingles above a
    * source-df cap first, as d46 does for doc-df). */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = docsWithToks(spark, sfDir)
      .filter(size($"toks") >= 3)
      .select($"source", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))"""))
        .as("h"))
      .distinct()
    val totals = sh.groupBy($"source").agg(count(lit(1)).as("n_shingles"))
    val pairs = sh.groupBy($"h")
      .agg(sort_array(collect_set($"source")).as("srcs"))
      .filter(size($"srcs") >= 2)
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          transform(slice(srcs, i + 2, size(srcs)),
            b -> struct(a AS src_a, b AS src_b))))""")).as("p"))
      .select($"p.src_a", $"p.src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(totals.toDF("src_a", "n_a")), Seq("src_a"))
      .join(broadcast(totals.toDF("src_b", "n_b")), Seq("src_b"))
      .select($"src_a", $"src_b", $"n_common", $"n_a", $"n_b",
        r4($"n_common", least($"n_a", $"n_b")).as("overlap"))
      .orderBy($"src_a", $"src_b")
  }

  /** d51: dedup-method agreement matrix — the methods-quality audit a
    * pipeline owner runs before trusting a near-dup detector: for each
    * pair of methods among MinHash-LSH (d06, estimated Jaccard ≥ 0.5),
    * SimHash (d19, Hamming ≤ 1), and exact n-gram Jaccard (d08, ≥ 0.5
    * — the ground truth the other two approximate), the sizes of the
    * two detected pair sets, their intersection and union, and the
    * pair-set Jaccard agreement. Composes the three DECLARED queries
    * unchanged, so the audited sets are exactly what d06/d19/d08
    * report (and their session-cached signature/pair tables are
    * reused, not rebuilt).
    *
    * Determinism: exact counts; agreement is the r4 exact rational,
    * NULL on an empty union; method names give the total order.
    *
    * Scale design: inputs are the c²-per-dup-group pair TABLES (tiny
    * relative to the corpus — the d06/d08 scale notes apply to
    * producing them); the method self-join keys on (d1, d2) where
    * each method contributes at most one row, so fan-out is ≤ 3 per
    * pair; the 3-row method-pair seed and per-method totals are
    * broadcasts. */
  def methodAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val all =
      minhashLsh(spark, sfDir).select($"d1", $"d2", lit("minhash").as("m"))
        .unionAll(simhashNearDup(spark, sfDir)
          .select($"d1", $"d2", lit("simhash").as("m")))
        .unionAll(ngramJaccard(spark, sfDir)
          .select($"d1", $"d2", lit("jaccard").as("m")))
    val totals = all.groupBy($"m").agg(count(lit(1)).as("n"))
    val seed = Seq(("jaccard", "minhash"), ("jaccard", "simhash"),
      ("minhash", "simhash")).toDF("method_a", "method_b")
    val both = all.toDF("d1", "d2", "ma")
      .join(all.toDF("d1", "d2", "mb"), Seq("d1", "d2"))
      .filter($"ma" < $"mb")
      .groupBy($"ma".as("method_a"), $"mb".as("method_b"))
      .agg(count(lit(1)).as("n_both"))
    seed
      .join(both, Seq("method_a", "method_b"), "left_outer")
      .join(broadcast(totals.toDF("method_a", "n_a")),
        Seq("method_a"), "left_outer")
      .join(broadcast(totals.toDF("method_b", "n_b")),
        Seq("method_b"), "left_outer")
      .withColumn("n_a", coalesce($"n_a", lit(0L)))
      .withColumn("n_b", coalesce($"n_b", lit(0L)))
      .withColumn("n_both", coalesce($"n_both", lit(0L)))
      .withColumn("n_union", $"n_a" + $"n_b" - $"n_both")
      .select($"method_a", $"method_b", $"n_a", $"n_b", $"n_both",
        $"n_union",
        when($"n_union" > 0L, r4($"n_both", $"n_union")).as("agreement"))
      .orderBy($"method_a", $"method_b")
  }

  /** d55 bin width (chars). */
  private[graft] val LenBinChars = 100L

  /** d55: per-source document-length quantiles (p25/p50/p75/p95) via
    * binned read-off — the corpus-composition statistic a data-mixing
    * pipeline reads before setting source weights (short-doc sources
    * behave differently under d17's packing and d27's curation; d03
    * reports per-LANG means, this is the distribution per SOURCE).
    * e54's binned shape generalized from the median to arbitrary
    * ranks: per-(source, 100-char-bin) counts are ONE map-side-
    * combined hash-agg, and the four type-1 targets
    * (max(1, ⌈n·p/100⌉), e55's convention) read off the bin cumsum
    * with intra-bin interpolation floored to the char — within one bin
    * width of the exact per-group quantile, at full parallelism (the
    * exact per-group rank sort this avoids is the e53-class shape,
    * parallelism-capped at |sources| = 20).
    *
    * Determinism: pure int64 throughout; (source, pct) is a total
    * output order.
    *
    * Scale design: one hash-agg shuffle of |docs| rows; the cumsum
    * windows run over BIN rows (≤ length-range/width per source); the
    * ×4 percentile fan-out replicates bins, never documents. Bin
    * counts are monoid state — the s46 streaming shape applies
    * unchanged. */
  def sourceLengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val j = Tables.documents(spark, sfDir)
      .select($"source", $"n_chars".cast("long").as("len"))
    val bins = j.groupBy($"source",
        Det.fdiv($"len", lit(LenBinChars)).as("bin"))
      .agg(count(lit(1)).as("bc"))
    val w = Window.partitionBy($"source").orderBy($"bin")
    val wN = Window.partitionBy($"source")
    val pcts = Seq(25L, 50L, 75L, 95L).toDF("pct")
    bins
      .withColumn("cum", sum($"bc").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"bc").over(wN))
      .crossJoin(broadcast(pcts))
      .withColumn("tgt",
        greatest(lit(1L), Det.fdiv($"n" * $"pct" + 99L, lit(100L))))
      .filter($"cum" >= $"tgt" && $"cum" - $"bc" < $"tgt")
      .select($"source", $"pct", $"n",
        ($"bin" * LenBinChars +
          Det.fdiv(($"tgt" - ($"cum" - $"bc")) * LenBinChars, $"bc"))
          .as("chars"))
      .orderBy($"source", $"pct")
  }

  /** d57's shard count. 16 here; production sets thousands — every
    * shape below is |shards|-bounded only AFTER the per-doc hash-agg,
    * so the constant is free to grow. */
  private[graft] val ShardN = 16L

  /** The deterministic shard of the current row's `doc_id` — salted
    * md5 ("shard:"), top 8 hex chars as an unsigned int32, mod
    * [[ShardN]]; the d13 hash-split idiom at shard granularity. Pure
    * per-row codegen arithmetic: stable under corpus growth and input
    * order, which is the whole point of hash sharding (a re-run on a
    * re-partitioned copy of the corpus produces identical shards — the
    * 8×-splits sweep axis exercises exactly that). */
  private[graft] def shardOf: org.apache.spark.sql.Column =
    expr(s"CAST(conv(substr(md5(concat('shard:', CAST(doc_id AS STRING))), " +
      s"1, 8), 16, 10) AS BIGINT) % $ShardN")

  /** The manifest read-off over an EXPLICIT `cells(shard, n_docs,
    * n_tokens, n_bytes)` counter table — shared by d57 (batch-built
    * cells) and s51 (cells served out of streaming state), the
    * x05/s49 discipline: the two faces cannot drift. The balance
    * column is each shard's tokens against the perfectly-level ideal
    * (r4(n_tokens·N, total); 1.0 = level) — the skew statistic a
    * trainer's data loader cares about, since its epoch time is
    * max-over-shards. */
  private[graft] def shardManifestFrom(cells: DataFrame): DataFrame = {
    import cells.sparkSession.implicits._
    val tot = cells.agg(sum($"n_tokens").cast("long").as("total_tokens"))
    cells.crossJoin(broadcast(tot))
      .select($"shard", $"n_docs", $"n_tokens", $"n_bytes",
        r4($"n_tokens" * lit(ShardN), $"total_tokens").as("balance"))
      .orderBy($"shard")
  }

  /** d57: training-output shard manifest — the deterministic sharding
    * step a corpus writer runs before handing data to a trainer.
    * Every document is hash-assigned to one of [[ShardN]] fixed
    * shards ([[shardOf]]), and the manifest audits what the data
    * loader depends on: per-shard doc/token/byte totals plus the
    * tokens-vs-ideal balance ratio.
    *
    * Scale design (100 TB): ONE map-side-combined hash-agg over the
    * documents scan — the shard id is per-row codegen'd md5
    * arithmetic, so nothing shuffles except |shards| partial-agg rows
    * per task; the totals join broadcasts one row. Uniform hashing
    * keeps every shard within ~1/√(docs-per-shard) of level
    * regardless of corpus skew (the manifest MEASURES it rather than
    * assuming it). */
  def shardManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    shardManifestFrom(
      docsWithToks(spark, sfDir)
        .select(shardOf.as("shard"),
          size($"toks").cast("long").as("n_toks"), $"n_chars")
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").cast("long").as("n_tokens"),
          sum($"n_chars").cast("long").as("n_bytes")))
  }

  /** d58: token-budget water-filling across languages — the mixture
    * solver behind an LLM language-mix decision: given a global token
    * budget B = ⌊3·total/4⌋ and an EQUAL per-language target,
    * low-resource languages are capped at their full capacity (you
    * take every token they have) and their unused share is
    * redistributed to the rest (water-filling) — on the fixtures that
    * caps de/zh/fr/es at capacity and fills the remainder with en,
    * exactly the up-sample-low-resource shape. Emits per language its
    * capacity, the allocation, the capped flag, and the sampling rate
    * the downstream reader applies (r4(alloc, capacity); capped ⇒ 1.0).
    *
    * Closed form, no iteration: sort languages by capacity ascending
    * (lang asc ties); language i (1-based, n languages, prefix sums P)
    * is capped iff capacityᵢ·(n−i+1) ≤ B−Pᵢ₋₁ — under ascending order
    * the capped set is provably a prefix, so one window pass finds it
    * — and the shared level for the n−k uncapped languages is
    * L = ⌊(B−P_k)/(n−k)⌋. Σalloc ≤ B with residue < n−k (the floor's
    * remainder; a production writer hands the residue to the largest
    * language or ignores it — we document rather than hide it).
    * All-capped is impossible for B = ⌊3·total/4⌋ < total, so the n−k
    * divisor is never 0; both branches occur on every fixture SF
    * (GraftSpec asserts it).
    *
    * Scale design: the per-language capacity table is ONE hash-agg
    * over the documents scan; everything after runs over |languages|
    * rows (config-bounded, like bins), so the unpartitioned windows
    * are driver-trivial at any corpus size. Independent truth: the
    * ITERATIVE water-filling algorithm recomputed in plain Scala must
    * produce the identical allocation (GraftSpec) — a different
    * derivation, so a drifted closed-form inequality diverges there
    * while the mirrored oracle stays green. */
  def mixBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mixBudgetFrom(docsWithToks(spark, sfDir)
      .groupBy($"lang")
      .agg(sum(size($"toks")).cast("long").as("n_tokens"))
      .filter($"n_tokens" > 0L))
  }

  /** d58's closed-form water-filling over an EXPLICIT `(lang,
    * n_tokens)` capacity table — the seam GraftSpec uses to drive
    * synthetic capacity sets (one-giant, all-equal, exact-tie) through
    * the SAME closed form the declared query runs, pinned against the
    * iterative algorithm (the x06 `hllSetOpsOf` discipline). */
  private[graft] def mixBudgetFrom(per: DataFrame): DataFrame = {
    import per.sparkSession.implicits._
    val tot = per.agg(sum($"n_tokens").cast("long").as("total_tokens"),
      count(lit(1)).as("n_langs"))
    val w = Window.orderBy($"n_tokens", $"lang")
    val ranked = per.crossJoin(broadcast(tot))
      .withColumn("b", Det.fdiv($"total_tokens" * 3L, lit(4L)))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pfx", coalesce(sum($"n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        $"n_tokens" * ($"n_langs" - $"i" + 1L) <= $"b" - $"pfx")
    val capTot = ranked.agg(
      count(when($"capped", 1)).as("k"),
      coalesce(sum(when($"capped", $"n_tokens")), lit(0L)).cast("long")
        .as("sum_capped"))
    ranked.crossJoin(broadcast(capTot))
      .withColumn("alloc_tokens", when($"capped", $"n_tokens")
        .otherwise(Det.fdiv($"b" - $"sum_capped", $"n_langs" - $"k")))
      .select($"lang", $"n_tokens", $"alloc_tokens",
        when($"capped", 1L).otherwise(0L).as("capped"),
        r4($"alloc_tokens", $"n_tokens").as("sample_rate"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d57_shard_manifest" -> shardManifest _,
    "d58_mix_budget"     -> mixBudget _,
    "d55_source_len_quantiles" -> sourceLengthQuantiles _,
    "d54_banding_curve" -> bandingCurve _,
    "d53_reference_lm_filter" -> referenceLmFilter _,
    "d52_incremental_neardup" -> incrementalNearDup _,
    "d51_method_agreement" -> methodAgreement _,
    "d50_source_overlap" -> sourceOverlap _,
    "d49_snapshot_diff" -> snapshotDiff _,
    "d46_containment"   -> containmentDups _,
    "d47_classifier_score" -> classifierScore _,
    "d48_tokenizer_fertility" -> tokenizerFertility _,
    "d45_chunk_overlap" -> chunkOverlap _,
    "d56_chunk_dup_rollup" -> chunkDupRollup _,
    "d44_bigram_coverage" -> bigramCoverage _,
    "d43_source_drift"  -> sourceDrift _,
    "d01_exact_dedup"   -> exactDedup _,
    "d29_pagerank"      -> pageRank _,
    "d30_novelty"       -> noveltyScore _,
    "d02_top_terms"     -> topTerms _,
    "d03_lang_stats"    -> langStats _,
    "d04_quality_score" -> qualityScore _,
    "d05_fingerprint"   -> fingerprint _,
    "d06_minhash_lsh"   -> minhashLsh _,
    "d07_simhash"       -> simhash _,
    "d08_ngram_jaccard" -> ngramJaccard _,
    "d09_tfidf"         -> tfidf _,
    "d10_langid"        -> langId _,
    "d11_regex_tokens"  -> regexTokens _,
    "d12_dup_clusters"  -> dupClusters _,
    "d13_sample_split"  -> sampleSplit _,
    "d14_normalize_dedup" -> normalizeDedup _,
    "d15_decontaminate" -> decontaminate _,
    "d16_bigram_lm"     -> bigramLm _,
    "d17_pack_sequences" -> packSequences _,
    "d18_repetition"    -> repetition _,
    "d19_simhash_neardup" -> simhashNearDup _,
    "d20_mix_weights"   -> mixWeights _,
    "d21_cross_source_dups" -> crossSourceDups _,
    "d22_canonical_neardup" -> canonicalNearDup _,
    "d23_bloom_decontaminate" -> bloomDecontaminate _,
    "d24_boilerplate"   -> boilerplate _,
    "d25_shared_substrings" -> sharedSubstrings _,
    "d26_token_entropy" -> tokenEntropy _,
    "d28_bm25"          -> bm25 _,
    "d31_redact"        -> redact _,
    "d33_zipf_slope"    -> zipfSlope _,
    "d34_source_caps"   -> sourceCaps _,
    "d36_bpe_merges"    -> bpeMerges _,
    "d37_inverted_index" -> invertedIndex _,
    "d38_lpa_communities" -> labelPropagation _,
    "d41_pmi_pairs"     -> pmiPairs _,
    "d42_pps_sample"    -> ppsSample _,
    "d35_dup_triangles" -> dupTriangles _,
  )

  /** The shingle→minhash→band prefix of the MinHash pipeline as a DuckDB
    * CTE chain ending at `bands(doc_id, band, bh)` — shared by
    * [[mhPairsCte]] and the s24 streaming near-dup oracle
    * ([[graft.streaming.StreamOps]]), mirroring [[lshBands]]. */
  private[graft] def mhBandsCte: String =
    s"""t0 AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
       |  WHERE len(str_split(text, ' ')) >= 3),
       |tok AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
       |  for g in range(1, len(toks) - 1)])) AS t FROM t0),
       |xs AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % $MhP AS x FROM tok),
       |sig AS (SELECT doc_id, s, min((a * x + b) % $MhP) AS h
       |  FROM xs CROSS JOIN $mhSeedsSql GROUP BY doc_id, s),
       |bands AS (SELECT doc_id, s // 4 AS band, string_agg(h::VARCHAR, '${"|"}' ORDER BY s) AS bh
       |  FROM sig GROUP BY doc_id, s // 4)""".stripMargin

  /** Oracle-text fragments this module shares verbatim between its
    * Spark formulas and its DuckDB oracles (or across query faces) —
    * see [[graft.operators.Extras.sharedOracleFragments]] for the
    * FormulaAuditSpec contract these feed. */
  /** The d45/d56 chunk-grid prefix (tokenize + window index) as a
    * DuckDB CTE pair — shared by both oracle texts so the grid
    * geometry cannot drift between the chunker and the rollup. */
  private[graft] def chunkGridCte: String =
    s"""t AS (SELECT doc_id, str_split(text, ' ') AS toks,
       |    len(str_split(text, ' ')) AS n FROM documents),
       |c AS (SELECT doc_id, unnest(range(0, (n - 1) // $ChunkStride + 1)) AS i,
       |    toks, n FROM t)""".stripMargin

  /** d57's FULL oracle text — shared VERBATIM with s51 (the streaming
    * shard-manifest ingest, [[graft.streaming.StreamOps]]): the shard
    * cells folded through streaming state must serve the batch truth
    * (the x05/s49 discipline applied to the output-sharding manifest).
    * Mirrors [[shardOf]] + [[shardManifestFrom]]. */
  private[graft] def shardManifestSql: String =
    s"""WITH d AS (SELECT
       |  ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |    % $ShardN AS shard,
       |  len(str_split(text, ' ')) AS n_toks, n_chars FROM documents),
       |s AS (SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS n_bytes FROM d GROUP BY 1),
       |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM s)
       |SELECT shard, n_docs, n_tokens, n_bytes,
       |  ${Det.sql.r4(s"n_tokens * $ShardN", "total_tokens")} AS balance
       |FROM s CROSS JOIN t ORDER BY shard""".stripMargin

  /** d58's water-filling core as a CTE chain ending at `wk` (the
    * ranked capacity table with the capped flag, plus the capped-set
    * totals) — the closed-form capping inequality mirrored from
    * [[mixBudget]], declared as a shared fragment so FormulaAuditSpec
    * forces the independent-truth row (the ITERATIVE recomputation in
    * GraftSpec). */
  private[graft] def waterfillCte: String =
    """ws AS (SELECT lang,
      |  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1
      |  HAVING sum(len(str_split(text, ' '))) > 0),
      |wt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  count(*) AS n_langs FROM ws),
      |wr AS (SELECT lang, n_tokens, total_tokens, n_langs,
      |  (total_tokens * 3) // 4 AS b,
      |  CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) AS i,
      |  COALESCE(CAST(sum(n_tokens) OVER (ORDER BY n_tokens, lang
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |    0) AS pfx
      |  FROM ws CROSS JOIN wt),
      |wc AS (SELECT *,
      |  (n_tokens * (n_langs - i + 1) <= b - pfx) AS capped FROM wr),
      |wk AS (SELECT wc.*, k.k, k.sum_capped FROM wc CROSS JOIN (
      |  SELECT CAST(count(*) FILTER (WHERE capped) AS BIGINT) AS k,
      |    COALESCE(CAST(sum(n_tokens) FILTER (WHERE capped) AS BIGINT),
      |      0) AS sum_capped FROM wc) k)""".stripMargin

  private[graft] def sharedOracleFragments: Map[String, String] = Map(
    "chunk-grid" -> chunkGridCte,
    "minhash-bands" -> mhBandsCte,
    "simhash-pairs" -> simhashPairsCte,
    "jaccard-pairs" -> jaccardPairsCte,
    "bm25" -> bm25Cte,
    "quality-score" -> qualityCte,
    "shard-manifest" -> shardManifestSql,
    "waterfill-alloc" -> waterfillCte)

  /** The d06 MinHash pipeline as a DuckDB CTE chain ending at `m`
    * (candidate pairs + matching-permutation counts) — shared verbatim
    * by the d06, d21, and v27 oracles so they can never drift. */
  private[graft] def mhPairsCte: String =
    s"""$mhBandsCte,
       |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |m AS (SELECT c.d1, c.d2, sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS nm
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.d1
       |  JOIN sig sb ON sb.doc_id = c.d2 AND sb.s = sa.s GROUP BY 1, 2)""".stripMargin

  /** d19's SimHash pipeline as a CTE chain ending at
    * `sxp(d1, d2, hamming)` (Hamming ≤ 1 applied) — shared by the d19
    * oracle and the d51 method-agreement oracle so the pair-set
    * definition cannot drift. Names are sx-prefixed to compose with
    * [[mhPairsCte]] / [[jaccardPairsCte]] in one WITH. */
  private[graft] def simhashPairsCte: String =
    """sxtok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents),
      |sxbits AS (SELECT doc_id, i,
      |  CASE WHEN sum(CASE WHEN strpos('89abcdef', substr(md5(t), i, 1)) > 0
      |    THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS b
      |  FROM sxtok CROSS JOIN (SELECT unnest(range(1, 33)) AS i) GROUP BY doc_id, i),
      |sxsh AS (SELECT doc_id,
      |  sum(CASE WHEN b = '1' THEN 1::BIGINT << (32 - i) ELSE 0 END)::BIGINT AS sig
      |  FROM sxbits GROUP BY doc_id),
      |sxseg AS (SELECT doc_id, s,
      |  CASE WHEN s = 0 THEN sig // 65536 ELSE sig % 65536 END AS sg
      |  FROM sxsh CROSS JOIN (SELECT unnest(range(0, 2)) AS s)),
      |sxcand AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM sxseg a JOIN sxseg b
      |  ON a.s = b.s AND a.sg = b.sg AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |sxp AS (SELECT d1, d2, bit_count(xor(ha.sig, hb.sig)) AS hamming
      |  FROM sxcand JOIN sxsh ha ON ha.doc_id = d1 JOIN sxsh hb ON hb.doc_id = d2
      |  WHERE bit_count(xor(ha.sig, hb.sig)) <= 1)""".stripMargin

  /** d08's exact n-gram Jaccard pipeline as a CTE chain ending at
    * `jxp(d1, d2, jaccard)` (threshold ≥ 0.5 on the unrounded ratio,
    * rounded value carried) — shared by the d08 oracle and d51.
    * jx-prefixed names compose with the other chains. */
  private[graft] def jaccardPairsCte: String =
    """jxt AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
      |  WHERE len(str_split(text, ' ')) >= 3),
      |jxsh AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
      |  for g in range(1, len(toks) - 1)])) AS s FROM jxt),
      |jxsz AS (SELECT doc_id, count(*) AS n FROM jxsh GROUP BY doc_id),
      |jxc AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM jxsh a JOIN jxsh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |jxp AS (SELECT d1, d2,
      |  round(common / CAST(sa.n + sb.n - common AS DOUBLE), 4) AS jaccard
      |  FROM jxc JOIN jxsz sa ON sa.doc_id = d1 JOIN jxsz sb ON sb.doc_id = d2
      |  WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.5)""".stripMargin

  /** The d28 BM25 scoring pipeline as a DuckDB CTE chain ending at
    * `sc(doc_id, term, score)` — shared by the d28 oracle and the v17
    * retrieve-then-expand oracle ([[graft.operators.VectorOps]]), so
    * the scoring definition cannot drift. */
  private[graft] def bm25Cte: String =
    s"""tk AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl, count(*) AS n_docs FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM
       |  (SELECT doc_id, unnest(toks) AS term FROM tk) x
       |  WHERE term IN (${Bm25Terms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id, tf.term,
       |  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |    * (tf * ${Bm25K1 + 1.0})
       |    / (tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl.dl * n_docs / sum_dl)), 4) AS score
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN tot)""".stripMargin

  /** The d04 quality score as a DuckDB CTE chain ending at
    * `qual(doc_id, source, n_chars, n_tokens, n_uniq, n_stop, quality)`
    * — shared by the d04 and d34 oracles so the scoring definition (and
    * its exact integer rounding) cannot drift between them. */
  private[graft] def qualityCte: String =
    """qt AS (SELECT doc_id, source, n_chars, str_split(text, ' ') AS toks FROM documents),
      |qm AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |  CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT) AS n_stop
      |  FROM qt),
      |qual AS (SELECT doc_id, source, n_chars, n_tokens, n_uniq, n_stop,
      |  (((n_uniq * 4000 + (n_tokens - n_stop) * 3000
      |    + least(100, n_tokens) * 30 * n_tokens) * 20000 + n_tokens * 10000)
      |  // (n_tokens * 20000)) / 10000.0 AS quality
      |  FROM qm)""".stripMargin

  /** The d29 power iterations unrolled as CTEs (it1..it5), each one
    * contribution-aggregate + node left join in exact integer
    * arithmetic — mirrors the Spark loop body verbatim. */
  private def pagerankIterCtes: String =
    (1 to 5).map { i =>
      val prev = if (i == 1) "r0" else s"it${i - 1}"
      s"""it$i AS (SELECT d.doc_id,
         |  CAST((15 * (1000000000000 // nn.n)) // 100
         |    + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM documents d CROSS JOIN nn LEFT JOIN
         |    (SELECT ed.dst, sum($prev.r // ed.deg) AS s
         |     FROM ed JOIN $prev ON $prev.doc_id = ed.src
         |     GROUP BY ed.dst) s ON s.dst = d.doc_id)""".stripMargin
    }.mkString(",\n")

  /** One d36 BPE merge round as CTEs over the positional unit table
    * t{i-1}(doc_id, pos, tok) — pair counting, 1-row argmax, the
    * gaps-and-islands odd-offset greedy resolution, and the reindexed
    * rewrite t{i}; mirrors the Spark loop body verbatim. */
  private def bpeIterCte(i: Int): String = {
    val prev = s"t${i - 1}"
    s"""w$i AS (SELECT doc_id, pos, tok,
       |  lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |  FROM $prev),
       |b$i AS (SELECT tok AS a, nxt AS b, count(*) AS cnt FROM w$i
       |  WHERE nxt IS NOT NULL GROUP BY tok, nxt
       |  ORDER BY cnt DESC, tok, nxt LIMIT 1),
       |k$i AS (SELECT doc_id, pos FROM (
       |  SELECT doc_id, pos, row_number() OVER
       |    (PARTITION BY doc_id, grp ORDER BY pos) AS k
       |  FROM (SELECT m.doc_id, m.pos, m.pos - row_number() OVER
       |      (PARTITION BY m.doc_id ORDER BY m.pos) AS grp
       |    FROM w$i m, b$i WHERE m.tok = b$i.a AND m.nxt = b$i.b))
       |  WHERE k % 2 = 1),
       |mk$i AS (SELECT doc_id, pos, 1 AS mk FROM k$i
       |  UNION ALL SELECT doc_id, pos + 1, 2 FROM k$i),
       |t$i AS (SELECT doc_id, row_number() OVER
       |    (PARTITION BY doc_id ORDER BY oldpos) AS pos, tok FROM (
       |  SELECT w.doc_id, w.pos AS oldpos,
       |    CASE WHEN mk.mk = 1 THEN w.tok || ' ' || w.nxt ELSE w.tok END AS tok
       |  FROM w$i w LEFT JOIN mk$i mk
       |    ON w.doc_id = mk.doc_id AND w.pos = mk.pos
       |  WHERE mk.mk IS NULL OR mk.mk = 1)),
       |res$i AS (SELECT CAST($i AS BIGINT) AS it, a || ' ' || b AS merge,
       |  CAST(cnt AS BIGINT) AS n_pairs,
       |  CAST((SELECT count(*) FROM k$i) AS BIGINT) AS n_applied
       |  FROM b$i)""".stripMargin
  }

  private val D = Det.sql

  val oracles: Map[String, String] = Map(
    "d57_shard_manifest" -> shardManifestSql,
    // the alloc CASE appears twice (alloc_tokens and the r4 numerator)
    // because DuckDB lacks lateral column refs in this position; both
    // copies come from the same interpolation so they cannot drift
    "d58_mix_budget" -> {
      val alloc = "CASE WHEN capped THEN n_tokens " +
        "ELSE " + Det.sql.fdiv("b - sum_capped", "n_langs - k") + " END"
      s"""WITH $waterfillCte
         |SELECT lang, n_tokens, $alloc AS alloc_tokens,
         |  CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped,
         |  ${Det.sql.r4(alloc, "n_tokens")} AS sample_rate
         |FROM wk ORDER BY lang""".stripMargin
    },
    // e54's binned read-off generalized to four type-1 targets; the
    // interpolated char value is CAST back to BIGINT (window-sum
    // arithmetic types as HUGEINT in DuckDB)
    "d55_source_len_quantiles" ->
      s"""WITH j AS (SELECT source, CAST(n_chars AS BIGINT) AS len
         |  FROM documents),
         |b AS (SELECT source, len // $LenBinChars AS bin,
         |    CAST(count(*) AS BIGINT) AS bc FROM j GROUP BY 1, 2),
         |c AS (SELECT source, bin, bc,
         |    sum(bc) OVER (PARTITION BY source ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(bc) OVER (PARTITION BY source) AS n FROM b),
         |p(pct) AS (VALUES (25), (50), (75), (95)),
         |t AS (SELECT c.*, CAST(p.pct AS BIGINT) AS pct,
         |    GREATEST(1, (c.n * p.pct + 99) // 100) AS tgt
         |  FROM c CROSS JOIN p)
         |SELECT source, pct, CAST(n AS BIGINT) AS n,
         |  CAST(bin * $LenBinChars
         |    + ((tgt - (cum - bc)) * $LenBinChars) // bc AS BIGINT) AS chars
         |FROM t WHERE cum >= tgt AND cum - bc < tgt
         |ORDER BY source, pct""".stripMargin,
    // the three pair sets from their SHARED CTE definitions (the same
    // text the d06/d19/d08 oracles run), then set algebra over them;
    // LEFT JOINs + COALESCE keep an empty method's row at zero
    "d51_method_agreement" ->
      s"""WITH $mhPairsCte,
         |mhp AS (SELECT d1, d2 FROM m WHERE nm / 16.0 >= 0.5),
         |$simhashPairsCte,
         |$jaccardPairsCte,
         |allp AS (SELECT d1, d2, 'minhash' AS m FROM mhp
         |  UNION ALL SELECT d1, d2, 'simhash' FROM sxp
         |  UNION ALL SELECT d1, d2, 'jaccard' FROM jxp),
         |tot AS (SELECT m AS meth, count(*) AS n FROM allp GROUP BY meth),
         |mp AS (SELECT 'jaccard' AS method_a, 'minhash' AS method_b
         |  UNION ALL SELECT 'jaccard', 'simhash'
         |  UNION ALL SELECT 'minhash', 'simhash'),
         |bo AS (SELECT a.m AS method_a, b.m AS method_b, count(*) AS n_both
         |  FROM allp a JOIN allp b
         |    ON a.d1 = b.d1 AND a.d2 = b.d2 AND a.m < b.m
         |  GROUP BY 1, 2),
         |f AS (SELECT mp.method_a, mp.method_b,
         |    CAST(COALESCE(ta.n, 0) AS BIGINT) AS n_a,
         |    CAST(COALESCE(tb.n, 0) AS BIGINT) AS n_b,
         |    CAST(COALESCE(bo.n_both, 0) AS BIGINT) AS n_both
         |  FROM mp LEFT JOIN tot ta ON ta.meth = mp.method_a
         |  LEFT JOIN tot tb ON tb.meth = mp.method_b
         |  LEFT JOIN bo ON bo.method_a = mp.method_a
         |    AND bo.method_b = mp.method_b)
         |SELECT method_a, method_b, n_a, n_b, n_both,
         |  n_a + n_b - n_both AS n_union,
         |  CASE WHEN n_a + n_b - n_both > 0 THEN
         |    ${D.r4("n_both", "(n_a + n_b - n_both)")} END AS agreement
         |FROM f ORDER BY method_a, method_b""".stripMargin,
    // same counts over RAW shingle strings (no xxhash64 in DuckDB —
    // the d15 equivalence-modulo-collisions note applies); the pair
    // table is the oracle's naive shingle self-join
    "d50_source_overlap" ->
      s"""WITH t AS (SELECT source, str_split(text, ' ') AS toks FROM documents
         |  WHERE len(str_split(text, ' ')) >= 3),
         |sh AS (SELECT DISTINCT source,
         |  unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
         |    for g in range(1, len(toks) - 1)])) AS s FROM t),
         |tot AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |    count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
         |  CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
         |  ${D.r4("CAST(n_common AS BIGINT)", "least(ta.n, tb.n)")}
         |    AS overlap
         |FROM pr JOIN tot ta ON ta.source = pr.src_a
         |JOIN tot tb ON tb.source = pr.src_b
         |ORDER BY src_a, src_b""".stripMargin,
    // brute-force semantics of d46's contract: candidates = pairs
    // sharing a rare (df ≤ cap) shingle; exact intersection over ALL
    // distinct shingles; cross-multiplied 5·common ≥ 4·min threshold
    "d46_containment" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |  WHERE len(str_split(text, ' ')) >= 3),
         |sh AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
         |  for g in range(1, len(toks) - 1)])) AS s FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN df ON df.s = a.s WHERE df.df <= $ContainDfCap),
         |c AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.d1, c.d2, CAST(sa.n AS BIGINT) AS n1,
         |  CAST(sb.n AS BIGINT) AS n2, CAST(c.common AS BIGINT) AS common,
         |  ${D.r4("c.common", "least(sa.n, sb.n)")} AS containment,
         |  ${D.r4("c.common", "sa.n + sb.n - c.common")} AS jaccard
         |FROM cand JOIN c ON c.d1 = cand.d1 AND c.d2 = cand.d2
         |JOIN sz sa ON sa.doc_id = c.d1 JOIN sz sb ON sb.doc_id = c.d2
         |WHERE c.common * 5 >= least(sa.n, sb.n) * 4
         |ORDER BY c.d1, c.d2""".stripMargin,
    // full-outer diff on the snapshot key; CASTs keep HUGEINT off the
    // schema
    // the d06 sig chain re-banded per layout (sig's s // r grouping),
    // hits counted against d08's exact-Jaccard truth chain
    "d54_banding_curve" -> {
      val layouts = BandLayouts.map { case (b, r) =>
        s"""l_$b AS (SELECT $b AS b, $r AS r,
           |    CAST(count(*) AS BIGINT) AS n_candidates,
           |    CAST(coalesce(sum(t), 0) AS BIGINT) AS n_hit FROM (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2 FROM
           |    (SELECT doc_id, s // $r AS band,
           |       string_agg(h::VARCHAR, '${"|"}' ORDER BY s) AS bh
           |     FROM sig GROUP BY doc_id, s // $r) a JOIN
           |    (SELECT doc_id, s // $r AS band,
           |       string_agg(h::VARCHAR, '${"|"}' ORDER BY s) AS bh
           |     FROM sig GROUP BY doc_id, s // $r) b
           |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2) c
           |  LEFT JOIN (SELECT d1, d2, 1 AS t FROM jxp) tr
           |    USING (d1, d2))""".stripMargin
      }.mkString(",\n")
      s"""WITH $mhBandsCte,
         |$jaccardPairsCte,
         |$layouts,
         |u AS (${BandLayouts.map { case (b, _) => s"SELECT * FROM l_$b" }
           .mkString(" UNION ALL ")}),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM jxp)
         |SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
         |  n_candidates, n_hit, n_truth,
         |  ${graft.functions.Det.sql.r4("n_hit", "n_truth")} AS recall
         |FROM u CROSS JOIN nt ORDER BY b""".stripMargin
    },
    // the d06 band/sig chain with the d49 snapshot-split literals:
    // candidates restricted to pairs touching a new arrival
    "d52_incremental_neardup" ->
      s"""WITH $mhBandsCte,
        |oldb AS (SELECT * FROM bands
        |  WHERE doc_id % $SnapOldMod <> ${SnapOldMod - 1}),
        |newb AS (SELECT * FROM bands
        |  WHERE doc_id % $SnapOldMod = ${SnapOldMod - 1}
        |    AND doc_id % $SnapNewMod <> ${SnapNewMod - 1}),
        |cand AS (
        |  SELECT a.doc_id AS d_new, b.doc_id AS d_match, 'corpus' AS phase
        |  FROM newb a JOIN oldb b ON a.band = b.band AND a.bh = b.bh
        |  GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT a.doc_id, b.doc_id, 'batch'
        |  FROM newb a JOIN newb b ON a.band = b.band AND a.bh = b.bh
        |    AND a.doc_id < b.doc_id GROUP BY 1, 2, 3),
        |m AS (SELECT c.d_new, c.d_match, c.phase,
        |    sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS nm
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.d_new
        |  JOIN sig sb ON sb.doc_id = c.d_match AND sb.s = sa.s
        |  GROUP BY 1, 2, 3)
        |SELECT d_new, d_match, phase, round(nm / 16.0, 4) AS est_jaccard
        |FROM m WHERE nm / 16.0 >= 0.5 ORDER BY d_new, d_match""".stripMargin,
    "d49_snapshot_diff" ->
      s"""WITH d AS (SELECT doc_id AS k, text,
        |    CAST(n_chars AS BIGINT) AS n_chars FROM documents),
        |o AS (SELECT k, md5(text) AS old_h, n_chars AS old_chars FROM d
        |  WHERE k % $SnapOldMod <> ${SnapOldMod - 1}),
        |n AS (SELECT k,
        |    md5(CASE WHEN k % $SnapEditMod = 0 THEN text || ' v2' ELSE text END) AS new_h,
        |    CASE WHEN k % $SnapEditMod = 0 THEN n_chars + 3 ELSE n_chars END AS new_chars
        |  FROM d WHERE k % $SnapNewMod <> ${SnapNewMod - 1}),
        |j AS (SELECT COALESCE(o.k, n.k) AS k, old_h, new_h,
        |    old_chars, new_chars,
        |    CASE WHEN old_h IS NULL THEN 'added'
        |      WHEN new_h IS NULL THEN 'removed'
        |      WHEN old_h = new_h THEN 'unchanged'
        |      ELSE 'changed' END AS status
        |  FROM o FULL OUTER JOIN n ON o.k = n.k)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(COALESCE(new_chars, 0)) AS BIGINT) AS new_chars,
        |  CAST(sum(COALESCE(old_chars, 0)) AS BIGINT) AS old_chars,
        |  CAST(min(k) AS BIGINT) AS min_key
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    // d36's t0 + three unrolled training rounds verbatim; the
    // evaluation reads the final table t3 per language
    "d48_tokenizer_fertility" ->
      s"""WITH t0 AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
         |  SELECT doc_id, unnest([{'pos': g, 'tok': toks[g]}
         |    for g in range(1, len(toks) + 1)]) AS u
         |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents))),
         |${bpeIterCte(1)},
         |${bpeIterCte(2)},
         |${bpeIterCte(3)},
         |du AS (SELECT doc_id, count(*) AS n_units,
         |  sum(CASE WHEN tok LIKE '% %' THEN 1 ELSE 0 END) AS n_merged
         |  FROM t3 GROUP BY doc_id),
         |dw AS (SELECT doc_id, lang,
         |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_units) AS BIGINT) AS n_units,
         |  CAST(sum(n_merged) AS BIGINT) AS n_merged,
         |  ${D.r4("CAST(sum(n_units) AS BIGINT)",
              "CAST(sum(n_words) AS BIGINT)")} AS compression
         |FROM du JOIN dw USING (doc_id) GROUP BY lang
         |ORDER BY lang""".stripMargin,
    // same md5-hex-prefix bucket hash as the minhash CTEs; the LCG
    // weight stays in BIGINT (2654435761·63 ≈ 1.7e11); only sum()
    // widens, hence the CASTs
    "d47_classifier_score" ->
      s"""WITH tk AS (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents),
         |hb AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS b FROM tk),
         |wv AS (SELECT doc_id, (2654435761 * b + 1013904223) % 2001 - 1000 AS w FROM hb)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(w) AS BIGINT) AS sum_w,
         |  ${D.r4("CAST(sum(w) AS BIGINT)", "count(*) * 1000")} AS score,
         |  CAST(sum(w) AS BIGINT) > 0 AS kept
         |FROM wv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // DuckDB's l[a:b] slice is 1-based inclusive and clamps past the
    // end, mirroring Spark's slice(toks, start+1, 32); str_split('')
    // = [''] on both sides → empty docs yield one ''-hash chunk
    "d45_chunk_overlap" ->
      s"""WITH $chunkGridCte
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * $ChunkStride AS BIGINT) AS start_tok,
        |  CAST(len(toks[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkLen]) AS BIGINT) AS n_tok,
        |  md5(array_to_string(toks[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkLen], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // the chunk grid is the SHARED chunkGridCte text (zero drift with
    // d45); candidates band on positional sub-hashes under the df cap,
    // the rollup mirrors the integer trim rule (n_dup*2 > n_chunks)
    "d56_chunk_dup_rollup" ->
      s"""WITH $chunkGridCte,
        |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |    toks[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkLen] AS chunk
        |  FROM c
        |  WHERE len(toks[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkLen]) = $ChunkLen),
        |subs AS (SELECT doc_id, chunk_idx, jj.j AS pos,
        |    md5(array_to_string(chunk[jj.j*$ChunkSub + 1 : jj.j*$ChunkSub + $ChunkSub], ' ')) AS sh
        |  FROM ch CROSS JOIN (SELECT unnest(range($ChunkSubN)) AS j) jj),
        |rare AS (SELECT * FROM subs
        |  QUALIFY count(*) OVER (PARTITION BY pos, sh) <= $ChunkDfCap),
        |cand AS (SELECT a.doc_id AS d1, a.chunk_idx AS c1,
        |    b.doc_id AS d2, b.chunk_idx AS c2, count(*) AS npos
        |  FROM rare a JOIN rare b ON a.pos = b.pos AND a.sh = b.sh
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |fl AS (SELECT DISTINCT doc_id, chunk_idx FROM (
        |    SELECT d1 AS doc_id, c1 AS chunk_idx FROM cand
        |      WHERE npos >= $ChunkMinPos
        |    UNION ALL
        |    SELECT d2, c2 FROM cand WHERE npos >= $ChunkMinPos) u)
        |SELECT ch.doc_id AS doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup,
        |  ${D.r4("CAST(sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)", "count(*)")} AS dup_frac,
        |  CASE WHEN sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |      * 2 > count(*)
        |    THEN 'trim' ELSE 'keep' END AS action
        |FROM ch LEFT JOIN fl
        |  ON fl.doc_id = ch.doc_id AND fl.chunk_idx = ch.chunk_idx
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,
    // DuckDB lists are 1-based (t[i-1]||' '||t[i] over i ∈ 2..len ≡
    // Spark's 0-based toks[i-1]+' '+toks[i] over i ∈ 1..size-1);
    // str_split('',' ') = [''] (len 1) on both sides → the len≥2
    // filter drops empty docs identically
    "d44_bigram_coverage" ->
      s"""WITH bi AS (SELECT doc_id,
         |    unnest(list_transform(range(2, len(t) + 1),
         |      i -> t[i-1] || ' ' || t[i])) AS bigram
         |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) s
         |  WHERE len(t) >= 2),
         |head AS (SELECT bigram FROM bi GROUP BY bigram
         |  ORDER BY count(*) DESC, bigram LIMIT 200)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN bigram IN (SELECT bigram FROM head)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS covered,
         |  ${D.r4("CAST(sum(CASE WHEN bigram IN (SELECT bigram FROM head) THEN 1 ELSE 0 END) AS BIGINT)",
              "count(*)")} AS coverage
         |FROM bi GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // drift_ppb sums BIGINTs (HUGEINT in DuckDB) → CAST back on output;
    // rates mirror Det.fdiv exactly (non-negative here, but keep the
    // explicit floor for symmetry with the Spark side)
    "d43_source_drift" ->
      s"""WITH tok AS (SELECT source, unnest(str_split(text, ' ')) AS term
         |  FROM documents),
         |st AS (SELECT source, term, count(*) AS tf FROM tok
         |  GROUP BY source, term),
         |tot_src AS (SELECT source, CAST(sum(tf) AS BIGINT) AS tot_src
         |  FROM st GROUP BY source),
         |term_tot AS (SELECT term, CAST(sum(tf) AS BIGINT) AS tf_all
         |  FROM st GROUP BY term),
         |top AS (SELECT term, tf_all FROM term_tot
         |  ORDER BY tf_all DESC, term LIMIT $DriftTerms),
         |tot_all AS (SELECT CAST(sum(tf_all) AS BIGINT) AS tot_all
         |  FROM term_tot),
         |grid AS (SELECT s.source, t.term, s.tot_src, t.tf_all, a.tot_all,
         |    COALESCE(st.tf, 0) AS tf
         |  FROM tot_src s CROSS JOIN top t CROSS JOIN tot_all a
         |  LEFT JOIN st ON st.source = s.source AND st.term = t.term),
         |d AS (SELECT source, term, tot_src,
         |    abs(${D.fdiv("tf * 1000000000", "tot_src")} -
         |        ${D.fdiv("tf_all * 1000000000", "tot_all")}) AS diff_ppb
         |  FROM grid),
         |r AS (SELECT source, term, tot_src, diff_ppb,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY diff_ppb DESC, term) AS rn,
         |    CAST(sum(diff_ppb) OVER (PARTITION BY source) AS BIGINT)
         |      AS drift_ppb
         |  FROM d)
         |SELECT source, tot_src AS total_tokens, drift_ppb,
         |  term AS top_term, diff_ppb AS top_term_ppb
         |FROM r WHERE rn = 1 ORDER BY source""".stripMargin,
    "d36_bpe_merges" ->
      s"""WITH t0 AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
         |  SELECT doc_id, unnest([{'pos': g, 'tok': toks[g]}
         |    for g in range(1, len(toks) + 1)]) AS u
         |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents))),
         |${bpeIterCte(1)},
         |${bpeIterCte(2)},
         |${bpeIterCte(3)}
         |SELECT it, merge, n_pairs, n_applied FROM
         |  (SELECT * FROM res1 UNION ALL SELECT * FROM res2
         |   UNION ALL SELECT * FROM res3) ORDER BY it""".stripMargin,
    "d37_inverted_index" ->
      """WITH tf AS (SELECT term, doc_id, count(*) AS tf FROM
        |  (SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |   FROM documents) GROUP BY term, doc_id),
        |top AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT)
        |  AS tf_total FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 50),
        |r AS (SELECT term, doc_id, tf, row_number() OVER
        |  (PARTITION BY term ORDER BY doc_id) AS rn FROM tf
        |  WHERE term IN (SELECT term FROM top)),
        |p AS (SELECT term, string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
        |  AS postings FROM r WHERE rn <= 10 GROUP BY term)
        |SELECT t.term, t.df, t.tf_total, p.postings FROM top t
        |JOIN p USING (term) ORDER BY t.df DESC, t.term""".stripMargin,
    "d30_novelty" ->
      """WITH t0 AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |tok AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
        |  for g in range(1, len(toks) - 1)])) AS s FROM t0),
        |own AS (SELECT s, min(doc_id) AS first_doc FROM tok GROUP BY s)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |((sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 20000 + count(*))
        |  // (count(*) * 2)) / 10000.0 AS novelty
        |FROM tok JOIN own USING (s) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d29_pagerank" ->
      s"""WITH $mhPairsCte,
         |p AS (SELECT d1, d2 FROM m WHERE nm / 16.0 >= 0.5),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM p
         |  UNION ALL SELECT d2, d1 FROM p),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |ed AS (SELECT e.src, e.dst, d.deg FROM edges e
         |  JOIN deg d ON d.src = e.src),
         |nn AS (SELECT count(*) AS n FROM documents),
         |r0 AS (SELECT doc_id, (1000000000000 // nn.n) AS r
         |  FROM documents CROSS JOIN nn),
         |$pagerankIterCtes
         |SELECT doc_id, r AS rank_pico FROM it5 ORDER BY doc_id""".stripMargin,
    "d28_bm25" ->
      s"""WITH $bm25Cte,
         |rk AS (SELECT term, doc_id, score, row_number()
         |  OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT term, rank, doc_id, score FROM rk WHERE rank <= 5
         |ORDER BY term, rank""".stripMargin,
    "d20_mix_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  count(*) AS n_sources FROM s)
        |SELECT source, n_docs, n_tokens,
        |((n_tokens * 20000 + total_tokens) // (total_tokens * 2)) / 10000.0
        |  AS token_share,
        |((total_tokens * 20000 + n_sources * n_tokens)
        |  // (n_sources * n_tokens * 2)) / 10000.0 AS uniform_weight
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin,
    "d19_simhash_neardup" ->
      s"""WITH $simhashPairsCte
         |SELECT d1, d2, CAST(hamming AS BIGINT) AS hamming FROM sxp
         |ORDER BY d1, d2""".stripMargin,
    "d17_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin,
    "d18_repetition" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |g3 AS (SELECT doc_id, count(*) AS n_3grams,
        |  count(DISTINCT g) AS n_distinct_3grams
        |  FROM (SELECT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      for i in range(1, len(toks) - 1)]) AS g FROM t) x
        |  GROUP BY doc_id),
        |g2 AS (SELECT doc_id, max(c) AS top_2gram_count
        |  FROM (SELECT doc_id, g, count(*) AS c
        |    FROM (SELECT doc_id,
        |      unnest([toks[i] || ' ' || toks[i+1]
        |        for i in range(1, len(toks))]) AS g FROM t) y
        |    GROUP BY doc_id, g) z
        |  GROUP BY doc_id)
        |SELECT doc_id, n_3grams, n_distinct_3grams,
        |(((n_3grams - n_distinct_3grams) * 20000 + n_3grams)
        |  // (n_3grams * 2)) / 10000.0 AS dup_3gram_frac,
        |top_2gram_count
        |FROM g3 JOIN g2 USING (doc_id) ORDER BY doc_id""".stripMargin,
    "d15_decontaminate" ->
      """WITH d AS (SELECT doc_id, lang, str_split(text, ' ') AS toks,
        |  substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS kb,
        |  substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS sb
        |  FROM documents),
        |k AS (SELECT doc_id, toks, CASE WHEN sb < 'cc' THEN 'train'
        |  WHEN sb < 'e6' THEN 'val' ELSE 'test' END AS split
        |  FROM d WHERE kb < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
        |  AND len(toks) >= 3),
        |sh AS (SELECT doc_id, split,
        |  unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
        |    for g in range(1, len(toks) - 1)])) AS s FROM k),
        |ho AS (SELECT DISTINCT s FROM sh WHERE split = 'test'),
        |tr AS (SELECT doc_id, s FROM sh WHERE split = 'train'),
        |sz AS (SELECT doc_id, count(*) AS n_ngrams FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, count(*) AS n_shared FROM tr JOIN ho USING (s)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_ngrams, n_shared,
        |  ((n_shared * 20000 + n_ngrams) // (n_ngrams * 2)) / 10000.0
        |    AS contamination
        |FROM hit JOIN sz USING (doc_id) ORDER BY doc_id""".stripMargin,
    "d24_boilerplate" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 5),
        |ch AS (SELECT DISTINCT doc_id,
        |  unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |    || toks[i+3] || ' ' || toks[i+4]
        |    for i in range(1, len(toks) - 3, 5)]) AS c FROM t),
        |f AS (SELECT c, count(*) AS n_docs_with FROM ch GROUP BY c)
        |SELECT doc_id, count(*) AS n_chunks,
        |CAST(sum(CASE WHEN n_docs_with >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_boiler,
        |((sum(CASE WHEN n_docs_with >= 3 THEN 1 ELSE 0 END) * 20000
        |  + count(*)) // (count(*) * 2)) / 10000.0 AS boiler_frac
        |FROM ch JOIN f USING (c)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the window hash differs per engine (xxhash64 vs DuckDB hash) but
    // is internal only: equal windows hash equal, and 64-bit collisions
    // are negligible at fixture scale (documented at the operator)
    "d25_shared_substrings" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= $SubW),
        |w AS (SELECT doc_id, unnest([{'pos': i,
        |  'h': hash(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |    || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
        |    || toks[i+6] || ' ' || toks[i+7])}
        |  for i in range(1, len(toks) - ${SubW - 2})], recursive := true)
        |  FROM t),
        |df AS (SELECT h FROM w GROUP BY h
        |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $SubDfCap),
        |wf AS (SELECT w.* FROM w JOIN df USING (h)),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        |  FROM wf a JOIN wf b ON a.h = b.h AND a.doc_id < b.doc_id),
        |runs AS (SELECT da, db, pa - pb AS diag,
        |  pa - row_number() OVER (PARTITION BY da, db, pa - pb ORDER BY pa)
        |    AS grp FROM p),
        |island AS (SELECT da, db, count(*) AS nwin FROM runs
        |  GROUP BY da, db, diag, grp)
        |SELECT da, db, CAST(max(nwin) + ${SubW - 1} AS BIGINT)
        |  AS longest_tokens,
        |CAST(sum(nwin) AS BIGINT) AS n_windows
        |FROM island GROUP BY da, db ORDER BY da, db""".stripMargin,
    // mirrors Det.r4 via Det.sql.r4 — the slope numerator is NEGATIVE,
    // where bare DuckDB // (truncating) would disagree with fdiv's
    // floor; sums CAST to BIGINT before the arithmetic (HUGEINT
    // widening was the d29/d30 round-5 hash-fail class)
    "d33_zipf_slope" ->
      s"""WITH tf AS (SELECT lang, unnest(str_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*) AS c FROM tf GROUP BY lang, tok),
        |r AS (SELECT lang, c, row_number() OVER (PARTITION BY lang
        |  ORDER BY c DESC, tok) AS rank FROM c),
        |xy AS (SELECT lang,
        |  CAST(round(ln(rank) * 10000) AS BIGINT) AS x,
        |  CAST(round(ln(c) * 10000) AS BIGINT) AS y
        |  FROM r WHERE rank <= 100),
        |s AS (SELECT lang, count(*) AS n_ranks,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x*y) AS BIGINT) AS sxy,
        |  CAST(sum(x*x) AS BIGINT) AS sxx FROM xy GROUP BY lang)
        |SELECT lang, n_ranks,
        |  ${graft.functions.Det.sql.r4(
             "n_ranks*sxy - sx*sy", "n_ranks*sxx - sx*sx")} AS zipf_slope
        |FROM s ORDER BY lang""".stripMargin,
    "d26_token_entropy" ->
      """WITH c AS (SELECT doc_id, tok, count(*) AS c FROM
        |  (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types FROM c GROUP BY doc_id),
        |sc AS (SELECT doc_id, n_tokens, n_types,
        |  c * CAST(round(ln(n_tokens / CAST(c AS DOUBLE)) * 1e6) AS BIGINT)
        |    AS wmicro
        |  FROM c JOIN n USING (doc_id))
        |SELECT doc_id, n_tokens, n_types,
        |  ((sum(wmicro) * 20000 + n_tokens * 1000000)
        |    // (n_tokens * 2000000)) / 10000.0 AS entropy
        |FROM sc GROUP BY doc_id, n_tokens, n_types
        |ORDER BY doc_id""".stripMargin,
    // identical to d15's oracle except the held-out side is every
    // non-train split — the bloom is a prefilter, not a semantics change
    "d23_bloom_decontaminate" ->
      """WITH d AS (SELECT doc_id, lang, str_split(text, ' ') AS toks,
        |  substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS kb,
        |  substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS sb
        |  FROM documents),
        |k AS (SELECT doc_id, toks, CASE WHEN sb < 'cc' THEN 'train'
        |  WHEN sb < 'e6' THEN 'val' ELSE 'test' END AS split
        |  FROM d WHERE kb < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
        |  AND len(toks) >= 3),
        |sh AS (SELECT doc_id, split,
        |  unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
        |    for g in range(1, len(toks) - 1)])) AS s FROM k),
        |ho AS (SELECT DISTINCT s FROM sh WHERE split <> 'train'),
        |tr AS (SELECT doc_id, s FROM sh WHERE split = 'train'),
        |sz AS (SELECT doc_id, count(*) AS n_ngrams FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, count(*) AS n_shared FROM tr JOIN ho USING (s)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_ngrams, n_shared,
        |  ((n_shared * 20000 + n_ngrams) // (n_ngrams * 2)) / 10000.0
        |    AS contamination
        |FROM hit JOIN sz USING (doc_id) ORDER BY doc_id""".stripMargin,
    // d16's bigram chain with counts from the 'en' reference slice
    // only, Laplace-smoothed (c2+1)/(c1+V), left joins for OOV
    "d53_reference_lm_filter" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |big AS (SELECT doc_id, unnest([{'w1': toks[g], 'w2': toks[g+1]}
        |  for g in range(1, len(toks))], recursive := true) FROM t),
        |refbig AS (SELECT big.* FROM big
        |  JOIN documents d ON d.doc_id = big.doc_id AND d.lang = 'en'),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM refbig GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM refbig GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM refbig),
        |sc AS (SELECT doc_id,
        |  CAST(round(ln((COALESCE(c1, 0) + v)
        |    / CAST(COALESCE(c2, 0) + 1 AS DOUBLE)) * 1e6) AS BIGINT) AS micro
        |  FROM big LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN v),
        |agg AS (SELECT doc_id, count(*) AS n_bigrams,
        |  ((sum(micro) * 20000 + count(*) * 1000000)
        |    // (count(*) * 2000000)) / 10000.0 AS avg_nll
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, avg_nll, avg_nll <= $RefLmKeepNll AS kept
        |FROM agg ORDER BY doc_id""".stripMargin,
    "d16_bigram_lm" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |big AS (SELECT doc_id, unnest([{'w1': toks[g], 'w2': toks[g+1]}
        |  for g in range(1, len(toks))], recursive := true) FROM t),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
        |sc AS (SELECT doc_id,
        |  CAST(round(ln(c1 / CAST(c2 AS DOUBLE)) * 1e6) AS BIGINT) AS micro
        |  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  ((sum(micro) * 20000 + count(*) * 1000000) // (count(*) * 2000000))
        |    / 10000.0 AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d14_normalize_dedup" ->
      """WITH n AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5,
        |  len(str_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS n_norm_tokens
        |  FROM documents)
        |SELECT doc_id, norm_md5, CAST(n_norm_tokens AS BIGINT) AS n_norm_tokens,
        |  min(doc_id) OVER (PARTITION BY norm_md5) AS canonical_id
        |FROM n ORDER BY doc_id""".stripMargin,
    "d13_sample_split" ->
      """WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS toks,
        |  substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS keep_bucket,
        |  substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS split_bucket
        |  FROM documents),
        |k AS (SELECT *, CASE WHEN split_bucket < 'cc' THEN 'train'
        |  WHEN split_bucket < 'e6' THEN 'val' ELSE 'test' END AS split
        |  FROM t WHERE keep_bucket < CASE WHEN lang = 'en' THEN '80' ELSE '33' END)
        |SELECT lang, split, count(*) AS n, min(doc_id) AS min_doc,
        |max(doc_id) AS max_doc, CAST(sum(len(toks)) AS BIGINT) AS total_tokens
        |FROM k GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS norm_hash,
        |min(doc_id) AS keep_id, count(*) AS n_copies,
        |string_agg(doc_id, ',' ORDER BY doc_id) AS members
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "d02_top_terms" ->
      """SELECT term, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents) t
        |GROUP BY term ORDER BY n DESC, term LIMIT 50""".stripMargin,
    "d03_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
        |round(sum(n_chars) / CAST(count(*) AS DOUBLE), 2) AS avg_chars,
        |CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "d04_quality_score" ->
      // exact integer half-up rounding, mirroring the Spark side:
      // round(10⁴·num/den) = (2·10⁴·num + den) // (2·den)
      s"""WITH $qualityCte
        |SELECT doc_id, n_tokens, n_uniq,
        |((n_uniq * 20000 + n_tokens) // (n_tokens * 2)) / 10000.0 AS ttr,
        |(((n_chars - (n_tokens - 1)) * 20000 + n_tokens) // (n_tokens * 2)) / 10000.0 AS avg_tok_len,
        |((n_stop * 20000 + n_tokens) // (n_tokens * 2)) / 10000.0 AS stop_ratio,
        |quality
        |FROM qual ORDER BY doc_id""".stripMargin,
    "d31_redact" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '\b(customer|key|value)\b')) AS BIGINT) AS n_masked,
        |md5(regexp_replace(text, '\b(customer|key|value)\b', '<MASK>', 'g')) AS masked_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d34_source_caps" ->
      s"""WITH $qualityCte,
        |ranked AS (SELECT doc_id, source, n_tokens, quality,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM qual)
        |SELECT doc_id, source, n_tokens, quality, cum_tokens,
        |cum_tokens <= $SourceCapTokens AS kept
        |FROM ranked ORDER BY doc_id""".stripMargin,
    "d05_fingerprint" ->
      """WITH t AS (SELECT doc_id, text, str_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, md5(text) AS md5_text, sha256(text) AS sha256_text,
        |list_min([md5(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] || ' ' || toks[g+3] || ' ' || toks[g+4])
        |  for g in range(1, len(toks) - 3)]) AS min_shingle_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "d06_minhash_lsh" ->
      s"""WITH $mhPairsCte
         |SELECT d1, d2, round(nm / 16.0, 4) AS est_jaccard FROM m
         |WHERE nm / 16.0 >= 0.5 ORDER BY d1, d2""".stripMargin,
    // all-integer systematic PPS draw over the d17-style cumulative
    // token axis; // is safe here (every operand non-negative)
    "d42_pps_sample" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |s AS (SELECT source, (max(cum) + 19) // 20 AS step
        |  FROM c GROUP BY source)
        |SELECT c.source, c.doc_id, c.n_tok,
        |  CAST(cum // step - (cum - n_tok) // step AS BIGINT) AS n_picks
        |FROM c JOIN s ON s.source = c.source
        |WHERE cum // step - (cum - n_tok) // step > 0
        |ORDER BY c.source, c.doc_id""".stripMargin,
    // doc-level co-occurrence self-join + one ln per surviving pair,
    // micro-rounded before the ordering (the d33 contract)
    "d41_pmi_pairs" ->
      """WITH dt AS (SELECT doc_id,
        |  unnest(list_distinct(str_split(text, ' '))) AS tok FROM documents),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |marg AS (SELECT tok, count(*) AS c FROM dt GROUP BY tok),
        |p AS (SELECT a.tok AS ta, b.tok AS tb, count(*) AS cab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY ta, tb HAVING count(*) >= 5)
        |SELECT ta, tb, CAST(cab AS BIGINT) AS cab,
        |  CAST(ma.c AS BIGINT) AS ca, CAST(mb.c AS BIGINT) AS cb,
        |  CAST(round(ln((cab * n.n_total) / CAST(ma.c * mb.c AS DOUBLE))
        |    * 10000) AS BIGINT) AS pmi_micro
        |FROM p JOIN marg ma ON ma.tok = p.ta
        |JOIN marg mb ON mb.tok = p.tb CROSS JOIN n
        |ORDER BY pmi_micro DESC, ta, tb LIMIT 20""".stripMargin,
    // d06's pair pipeline + 3 unrolled synchronous LPA rounds: per
    // round, neighbor-label counts and a (count desc, label asc)
    // argmin via row_number — the integer mirror of the Spark side's
    // (c, −label) struct max
    "d38_lpa_communities" -> {
      val round = (i: Int) => {
        val prev = s"l${i - 1}"
        s"""n$i AS (SELECT e.t AS node, l.label, count(*) AS c
           |  FROM ed e JOIN $prev l ON l.node = e.s GROUP BY e.t, l.label),
           |b$i AS (SELECT node, label FROM (SELECT node, label,
           |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
           |  FROM n$i) WHERE rn = 1),
           |l$i AS (SELECT l.node, COALESCE(b.label, l.label) AS label
           |  FROM $prev l LEFT JOIN b$i b ON b.node = l.node)""".stripMargin
      }
      s"""WITH $mhPairsCte,
         |p AS (SELECT d1, d2 FROM m WHERE nm / 16.0 >= 0.5),
         |ed AS (SELECT d1 AS s, d2 AS t FROM p
         |  UNION ALL SELECT d2, d1 FROM p),
         |l0 AS (SELECT DISTINCT s AS node, s AS label FROM ed),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT node AS doc_id, label AS community,
         |  count(*) OVER (PARTITION BY label) AS n_members
         |FROM l3 ORDER BY doc_id""".stripMargin
    },
    // d06's pair pipeline + canonical-orientation triangle joins; all
    // counts are count(*) BIGINT (no sum() → no HUGEINT widening)
    "d35_dup_triangles" ->
      s"""WITH $mhPairsCte,
         |p AS (SELECT d1, d2 FROM m WHERE nm / 16.0 >= 0.5),
         |deg AS (SELECT doc_id, count(*) AS degree FROM
         |  (SELECT d1 AS doc_id FROM p UNION ALL SELECT d2 FROM p)
         |  GROUP BY doc_id),
         |tri AS (SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c FROM p ab
         |  JOIN p bc ON ab.d2 = bc.d1
         |  JOIN p ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
         |cnt AS (SELECT doc_id, count(*) AS n_triangles FROM
         |  (SELECT a AS doc_id FROM tri UNION ALL SELECT b FROM tri
         |   UNION ALL SELECT c FROM tri) GROUP BY doc_id)
         |SELECT d.doc_id, d.degree,
         |  CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
         |  CASE WHEN d.degree < 2 THEN 0.0 ELSE
         |    ((2*COALESCE(c.n_triangles, 0)) * 20000 + d.degree*(d.degree-1))
         |      // (d.degree*(d.degree-1)*2) / 10000.0 END AS clustering
         |FROM deg d LEFT JOIN cnt c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "d21_cross_source_dups" ->
      s"""WITH $mhPairsCte,
         |pairs AS (SELECT d1, d2 FROM m WHERE nm / 16.0 >= 0.5)
         |SELECT least(da.source, db.source) AS src_a,
         |  greatest(da.source, db.source) AS src_b,
         |  count(*) AS n_pairs
         |FROM pairs JOIN documents da ON da.doc_id = d1
         |JOIN documents db ON db.doc_id = d2
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "d07_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents),
        |bits AS (SELECT doc_id, i,
        |  CASE WHEN sum(CASE WHEN strpos('89abcdef', substr(md5(t), i, 1)) > 0
        |    THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS b
        |  FROM tok CROSS JOIN (SELECT unnest(range(1, 17)) AS i) GROUP BY doc_id, i),
        |sh AS (SELECT doc_id, string_agg(b, '' ORDER BY i) AS simhash FROM bits GROUP BY doc_id)
        |SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS n_bucket
        |FROM sh ORDER BY doc_id""".stripMargin,
    "d22_canonical_neardup" ->
      """WITH reps AS (SELECT doc_id, text FROM (
        |  SELECT doc_id, text,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS rep
        |  FROM documents) x WHERE doc_id = rep),
        |t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM reps WHERE len(str_split(text, ' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
        |  for g in range(1, len(toks) - 1)])) AS s FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |c AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT d1, d2, round(common / CAST(sa.n + sb.n - common AS DOUBLE), 4) AS jaccard
        |FROM c JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
        |WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.5
        |ORDER BY d1, d2""".stripMargin,
    "d08_ngram_jaccard" ->
      s"""WITH $jaccardPairsCte
         |SELECT d1, d2, jaccard FROM jxp ORDER BY d1, d2""".stripMargin,
    "d09_tfidf" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents) x
        |  GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n_total FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |  round(tf.tf * ln(n.n_total / CAST(df.df AS DOUBLE)), 4) AS score,
        |  row_number() OVER (PARTITION BY tf.doc_id
        |    ORDER BY tf.tf * ln(n.n_total / CAST(df.df AS DOUBLE)) DESC, tf.term) AS rn
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, rn, term, score FROM scored WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "d10_langid" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(str_split(text, ' ')) AS dtoks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_intersect(dtoks, ['the', 'a'])) AS s_en,
        |  len(list_intersect(dtoks, ['data', 'table'])) AS s_es,
        |  len(list_intersect(dtoks, ['key', 'value'])) AS s_de,
        |  len(list_intersect(dtoks, ['join', 'merge'])) AS s_fr,
        |  len(list_intersect(dtoks, ['spark', 'hash'])) AS s_zh
        |  FROM t),
        |p AS (SELECT lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS predicted
        |  FROM s)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "d11_regex_tokens" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w != '') AS words
        |  FROM documents)
        |SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
        |CAST(coalesce((SELECT sum(CAST(ceil(length(w.x) / 4.0) AS BIGINT))
        |  FROM unnest(words) AS w(x)), 0) AS BIGINT) AS n_subwords,
        |CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq_words
        |FROM t ORDER BY doc_id""".stripMargin,
    "d12_dup_clusters" ->
      s"""WITH RECURSIVE t0 AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |  WHERE len(str_split(text, ' ')) >= 3),
         |tok AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
         |  for g in range(1, len(toks) - 1)])) AS t FROM t0),
         |xs AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % $MhP AS x FROM tok),
         |sig AS (SELECT doc_id, s, min((a * x + b) % $MhP) AS h
         |  FROM xs CROSS JOIN $mhSeedsSql GROUP BY doc_id, s),
         |bands AS (SELECT doc_id, s // 4 AS band, string_agg(h::VARCHAR, '${"|"}' ORDER BY s) AS bh
         |  FROM sig GROUP BY doc_id, s // 4),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |m AS (SELECT c.d1, c.d2 FROM cand c JOIN sig sa ON sa.doc_id = c.d1
        |  JOIN sig sb ON sb.doc_id = c.d2 AND sb.s = sa.s
        |  GROUP BY c.d1, c.d2 HAVING sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / 16.0 >= 0.5),
        |edges AS (SELECT d1, d2 FROM m UNION SELECT d2, d1 FROM m),
        |reach(a, b) AS (
        |  SELECT d1, d2 FROM edges
        |  UNION
        |  SELECT r.a, e.d2 FROM reach r JOIN edges e ON r.b = e.d1),
        |nodes AS (SELECT DISTINCT d1 AS doc_id FROM edges)
        |SELECT n.doc_id, least(n.doc_id, min(r.b)) AS cluster_id
        |FROM nodes n LEFT JOIN reach r ON r.a = n.doc_id
        |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,
  )
}
