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
object TextOps
    extends TextCoreOps
    with TextLshOps
    with TextStatsOps
    with TextRetrievalOps
    with TextCurationOps {

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
    // brute-force semantics of d46's contract (r14): candidates AND
    // the overlap count share one definition — rare (df ≤ cap)
    // shingles; cross-multiplied 5·common ≥ 4·min threshold
    "d46_containment" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |  WHERE len(str_split(text, ' ')) >= 3),
         |sh AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
         |  for g in range(1, len(toks) - 1)])) AS s FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |c AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN df ON df.s = a.s WHERE df.df <= $ContainDfCap
         |  GROUP BY 1, 2)
         |SELECT c.d1, c.d2, CAST(sa.n AS BIGINT) AS n1,
         |  CAST(sb.n AS BIGINT) AS n2, CAST(c.common AS BIGINT) AS common,
         |  ${D.r4("c.common", "least(sa.n, sb.n)")} AS containment,
         |  ${D.r4("c.common", "sa.n + sb.n - c.common")} AS jaccard
         |FROM c
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
