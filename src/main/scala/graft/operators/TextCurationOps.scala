package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det
import graft.functions.Det.r4

/** TextOps seam 5/5: CURATION — quality scoring (d04) and per-source
  * caps (d34), denylist redaction (d31), PPS sampling (d42),
  * decontamination (d15/d23) and boilerplate (d24), sequence packing
  * (d17), mix weights (d20) + water-filling budget (d58), classifier
  * scoring (d47), per-source length quantiles (d55), and the shard
  * manifest (d57). */
trait TextCurationOps extends TextCoreOps {
  this: TextLshOps with TextStatsOps =>
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
  private[graft] def qualityBase(spark: SparkSession, sfDir: String): DataFrame = {
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
  private[operators] val SourceCapTokens = 600L

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
  /** Per-doc distinct hashed 3-shingles — the decontamination probe
    * table, ONE definition shared by [[decontaminate]],
    * [[bloomDecontaminate]], and the curation pipeline's drop list
    * ([[graft.pipeline.TrainingDataPipeline]]). */
  private[graft] def hashedShingles(df: DataFrame): DataFrame =
    df.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))

  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = withSampleSplit(docsWithToks(spark, sfDir))
    val train = hashedShingles(docs.filter($"split" === "train"))
    val heldout = hashedShingles(docs.filter($"split" === "test"))
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
    val train = hashedShingles(docs.filter($"split" === "train"))
    // held-out = everything not trained on; one materialization feeds
    // both the bloom build and the exact verify join
    val heldout = hashedShingles(docs.filter($"split" =!= "train"))
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
}
