package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the scale-critical physical properties —
  * the things that decide whether a query survives a 100× scale-up:
  * filters reaching the parquet scan, scans reading only projected
  * columns, dimension joins broadcasting, hot paths staying inside
  * whole-stage codegen, and runtime Bloom-filter pruning kicking in on
  * selective shuffle joins. A regression in any of these keeps results
  * correct but silently destroys the scan/shuffle economics, so they
  * are pinned here rather than left to eyeball `.explain` audits. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection reach the parquet scan (pushdown & pruning)") {
    val df = Tables.documents(spark, sf)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter not pushed to scan:\n$plan")
    // scan must read ONLY the projected columns, not text/quality/...
    val readSchema = "ReadSchema: struct<doc_id:bigint,lang:string>"
    assert(plan.contains(readSchema), s"column pruning lost:\n$plan")
  }

  test("dim join broadcasts; fact side is never shuffled for it") {
    val df = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("bucketed join: co-bucketed tables join with NO shuffle exchange") {
    val (to, tc) = graft.sources.FileSources.ensureBucketedTables(spark, sf)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    // at fixture scale the dimension would broadcast (also correct);
    // the bucketing contract is about the big-big case, so force the
    // sort-merge path the 100 TB join takes
    spark.conf.set(thresholdKey, "-1")
    try {
      val df = spark.table(to)
        .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
      df.collect()
      val plan = planOf(df)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan not bucket-aware:\n$plan")
      // the bucket layout IS the exchange: none may appear in the plan
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("flagship aggregation runs inside whole-stage codegen") {
    val df = SparkEntry.entry(spark)
    df.collect() // AQE materializes codegen stages only in the final plan
    val plan = planOf(df)
    // codegen stages render as "*(n) Op" in the plan string; the agg
    // must be inside one, not interpreted
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined,
      s"hash agg fell out of codegen:\n$plan")
  }

  test("decontamination broadcasts the held-out set; corpus side unshuffled") {
    val plan = planOf(graft.operators.TextOps.decontaminate(spark, sf))
    // the held-out shingle set must be the broadcast side of the probe
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
  }

  test("market share join tree broadcasts every dimension") {
    val df = graft.operators.Relational.marketShare(spark, sf)
    df.collect()
    val plan = planOf(df)
    // customer/nation/region/supplier are all broadcast against the
    // lineitem-orders spine at fixture scale
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"cartesian crept into q18:\n$plan")
  }

  test("e50/e51/d50 broadcast their small sides; no sort-merge of data volume") {
    // e50: the corpus-max scalar rides a 1-row broadcast cross; the
    // per-user collapse is the only event-volume exchange
    val p50 = planOf(graft.operators.Events.rfmSegments(spark, sf))
    assert(!p50.contains("SortMergeJoin"), s"e50 shuffled a join:\n$p50")
    // e51: active-day semi join and the dau join are both broadcasts
    val p51 = planOf(graft.operators.Events.slidingMau(spark, sf))
    assert(p51.contains("BroadcastHashJoin"), s"e51 lost its BHJs:\n$p51")
    assert(!p51.contains("SortMergeJoin"), s"e51 shuffled a join:\n$p51")
    // d50: per-source totals are broadcast against the bounded pair
    // table; the corpus is never self-joined
    val pd50 = planOf(graft.operators.TextOps.sourceOverlap(spark, sf))
    assert(pd50.contains("BroadcastHashJoin"), s"d50 lost its BHJs:\n$pd50")
    assert(!pd50.contains("SortMergeJoin"), s"d50 shuffled a join:\n$pd50")
  }

  test("v25 pre-filter rides broadcasts: semi join and probe join are BHJs") {
    val p = planOf(graft.operators.VectorOps.filteredAnn(spark, sf))
    assert(p.contains("LeftSemi, BuildRight"),
      s"v25's metadata pre-filter is not a broadcast semi join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"v25 shuffled a join:\n$p")
  }

  test("kNN classify stays a bounded broadcast loop + windowed top-k") {
    val df = graft.operators.VectorOps.knnClassify(spark, sf)
    val plan = planOf(df)
    // the query set is the broadcast side; no shuffle of the corpus for
    // the scoring pass itself
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"query set not broadcast:\n$plan")
  }

  test("sequence packing plans shard-parallel windows, no global sort") {
    val df = graft.operators.TextOps.packSequences(spark, sf)
    val plan = planOf(df)
    // the cumsum window must partition by source (hash exchange), not
    // run over a single global ordering; the only global Sort allowed
    // is the final tiny output ordering after aggregation
    assert(plan.contains("hashpartitioning(source"),
      s"packing window not shard-partitioned:\n$plan")
  }

  test("SCD2 plans ONE exchange: post-filter windows reuse the lag sort") {
    val plan = planOf(graft.operators.Events.scd2Versions(spark, sf))
    // all three window functions share the (user_id → ts, event_id)
    // ordering; only the single hashpartitioning(user_id) exchange and
    // the final output ordering's range exchange may appear
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1,
      s"SCD2 expected exactly one hash exchange, got $exchanges:\n$plan")
  }

  test("compaction+tombstones costs exactly the e05 latest-by-key window") {
    val plan = planOf(graft.operators.Events.compactionTombstones(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"compaction expected one hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"compaction must not join:\n$plan")
  }

  test("BM25 broadcasts df and corpus stats; only postings shuffle") {
    val plan = planOf(graft.operators.TextOps.bm25(spark, sf))
    // df (5 rows) and totals (1 row) must arrive by broadcast — the
    // posting-list hash-aggs are the only shuffled data
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"BM25 stats not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a BM25 join regressed to SMJ:\n$plan")
  }

  test("q23: per-part stats join by hash, brand dim broadcast, no NLJ") {
    val plan = planOf(graft.operators.Relational.smallQtyRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"brand dim not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"correlated-avg join must stay an equi-join:\n$plan")
  }

  test("d32: held-out side broadcast; corpus never hash-shuffled pre-agg") {
    val plan = planOf(
      graft.operators.VectorOps.semanticDecontaminate(spark, sf))
    // the scored cross product must ride a BROADCAST nested loop (the
    // bounded benchmark side), never a shuffled cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"held-out side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"shuffled cartesian in the decontamination scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side should never sort-merge here:\n$plan")
  }

  test("d32: capped (declared) and unbounded (library default) forms " +
      "agree below the cap") {
    // the EvalCap is a benchmark-declared bound, not the operator's
    // semantics (r13 ADVICE): wherever the held-out split fits the cap
    // — every fixture SF — the two faces must be value-identical
    val capped = graft.operators.VectorOps
      .semanticDecontaminate(spark, sf).collect()
    val unbounded = graft.operators.VectorOps
      .semanticDecontaminate(spark, sf, evalCap = None).collect()
    assert(capped.nonEmpty && capped.toSeq == unbounded.toSeq)
  }

  test("d35: triangle enumeration is hash equi-joins only") {
    val plan = planOf(graft.operators.TextOps.dupTriangles(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle join must be an equi-join, not a cross-product:\n$plan")
  }

  test("e37 fuzzy match: blocked self-join stays an equi-join") {
    val plan = planOf(graft.operators.Extras.fuzzyNameMatch(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking key must drive an equi-join, never all-pairs:\n$plan")
  }

  test("d37 inverted index: top-term set broadcast; postings capped pre-collect") {
    val plan = planOf(graft.operators.TextOps.invertedIndex(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"top-50 term set should broadcast into the postings path:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cross:\n$plan")
  }

  test("q24: triple correlation decorrelates to ONE fact exchange + BHJ dim") {
    val plan = planOf(graft.operators.Relational.soleLatestShipper(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"supplier dim not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"EXISTS decorrelation regressed to self-joins:\n$plan")
    val factExchanges =
      "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(plan).length
    assert(factExchanges == 1,
      s"lineitem should shuffle exactly once (got $factExchanges):\n$plan")
  }

  test("v19: silhouette scan is join-free map work + one k-row agg") {
    val plan = planOf(graft.operators.VectorOps.silhouette(spark, sf))
    assert(!plan.contains("Join"),
      s"the corpus must never join for centroid distances:\n$plan")
  }

  test("d38: LPA final round is hash equi-joins only, no adjacency cross") {
    val plan = planOf(graft.operators.TextOps.labelPropagation(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"LPA must join edges to labels by key:\n$plan")
  }

  test("redaction is pure map work: no join, no hash exchange") {
    val plan = planOf(graft.operators.TextOps.redact(spark, sf))
    assert(!plan.contains("Join"), s"redaction must not join:\n$plan")
    // only the declared-output ordering's range exchange may appear
    assert(!plan.contains("Exchange hashpartitioning"),
      s"redaction must not shuffle:\n$plan")
  }

  test("source caps cost exactly one hash exchange (the per-source window)") {
    val plan = planOf(graft.operators.TextOps.sourceCaps(spark, sf))
    assert(!plan.contains("Join"),
      s"quality must ride the scan, not a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"source caps expected one hash exchange, got $exchanges:\n$plan")
  }

  test("q20's NOT IN subquery plans as a hash anti join, not a per-row subquery") {
    val df = graft.operators.Relational.brandsInNotIn(spark, sf)
    df.collect()
    val plan = planOf(df)
    // Catalyst rewrites NOT IN to a null-aware LeftAnti hash join; a
    // regression to nested-loop re-execution per row would be quadratic
    assert(plan.contains("LeftAnti"), s"NOT IN not an anti join:\n$plan")
    assert(plan.contains("LeftSemi"), s"IN not a semi join:\n$plan")
  }

  test("d23's bloom probe runs map-side in codegen before the verify join") {
    val df = graft.operators.TextOps.bloomDecontaminate(spark, sf)
    val plan = planOf(df)
    // the 8 KB filter is probed by a plain Filter expression (shiftleft/
    // element_at bit test) on the corpus side — no join, no shuffle for
    // the probe itself; the exact verify join then sees only survivors
    assert(plan.contains("shiftleft"), s"bloom probe not in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"verify join expected broadcast at fixture scale:\n$plan")
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val df = graft.sources.FileSources.partitionedRead(spark, sf)
      .filter(col("event_type") === "purchase")
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition pruning lost:\n$plan")
  }

  test("runtime Bloom filter prunes the big side of a selective shuffle join") {
    // the APPLICATION side must normally exceed 10 GB for injection —
    // force that minimum to 0 so the fixture-scale join qualifies; the
    // creation side keeps its default MAXIMUM (the tiny dim qualifies).
    // The mechanism under test is injection, not the size heuristics.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join — broadcast would subsume the bloom
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sel = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val df = Tables.orders(spark, sf)
        .join(sel, col("o_custkey") === col("c_custkey"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$optimized")
      // and it still answers correctly
      assert(df.count() ==
        Tables.orders(spark, sf).join(
          Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey")).count())
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("d08 verify join: AQE broadcasts the slim candidate list at runtime") {
    // the candidate list carries no explicit broadcast() hint (an
    // unconditional hint would OOM the driver on a pathological corpus)
    // — AQE's runtime size stats must still pick the broadcast so the
    // wide (doc, hash-array) table is probed in place, never shuffled
    val df = operators.TextOps.ngramJaccard(spark, sf)
    df.collect() // materialize so the plan string shows AQE's final picks
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate list not broadcast by AQE:\n$plan")
  }

  test("e42 OHLC: window sort and aggregation share one hash exchange") {
    val plan = planOf(operators.Events.ohlcBars(spark, sf))
    assert(!plan.contains("Join"), s"OHLC must not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"OHLC expected one hash exchange, got $exchanges:\n$plan")
  }

  test("e41 CUSUM costs one hash exchange; argmax runs as a group limit") {
    val plan = planOf(operators.Events.cusumChangepoint(spark, sf))
    assert(!plan.contains("Join"), s"CUSUM must not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"CUSUM expected one hash exchange, got $exchanges:\n$plan")
    // the rn=1 filter must push into the window sort as a group limit
    // (top-1 per key is computed during the sort, not after it)
    assert(plan.contains("WindowGroupLimit"),
      s"argmax not planned as a window group limit:\n$plan")
  }

  test("e44 funnel: both window passes and the user agg share one user_id exchange") {
    val plan = planOf(operators.Events.funnelStages(spark, sf))
    assert(!plan.contains("Join"), s"funnel must not self-join:\n$plan")
    // exactly one exchange partitions by user_id (serving both chained
    // windows AND the per-user aggregate); the only other hash exchange
    // is the tiny ≤4-row stage histogram
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userEx == 1,
      s"funnel expected one user_id exchange, got $userEx:\n$plan")
  }

  test("d44 coverage: head is a TakeOrdered(200) and the probe join broadcasts") {
    val plan = planOf(operators.TextOps.bigramCoverage(spark, sf))
    assert(plan.contains("TakeOrderedAndProject(limit=200"),
      s"head not a bounded TakeOrdered:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join must broadcast the 200-row head:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle on the bigram key:\n$plan")
  }

  test("e46 retention: cohort sizes broadcast; no SMJ forms") {
    val plan = planOf(operators.Events.cohortRetention(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort-size join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"retention grid must assemble by broadcast/shuffled-hash:\n$plan")
  }

  test("q27 histogram: collapsed value table built once; ranged cumsum, " +
      "offsets broadcast") {
    // r15 shape (OPTIMIZATION_r15.md): frequency table → range-
    // partitioned ordered chunks → per-chunk cumsum + broadcast chunk
    // offsets (the at-scale recombination the r12 note promised).
    // exchange counts on the pre-execution plan (the final AQE plan
    // re-prints reused subtrees inline, inflating textual counts)
    val plan = planOf(operators.Relational.equidepthHistogram(spark, sf))
    // the value-collapse exchange prints once per consumer (offsets
    // branch + cumsum probe) before AQE dedups it at runtime — the
    // "built once" claim is the ReusedExchange assertion below; here
    // pin that no THIRD value-keyed shuffle sneaks in
    val cEx = "Exchange hashpartitioning\\(c".r.findAllIn(plan).length
    assert(cEx <= 2, s"expected ≤2 value-key exchange prints, got $cEx:\n$plan")
    val rEx = "Exchange rangepartitioning\\(c".r.findAllIn(plan).length
    assert(rEx <= 2, s"expected ≤2 value range partition prints, got $rEx:\n$plan")
    // the chunk-offset attach must broadcast the ≤|chunks|-row side,
    // never shuffle or sort-merge the frequency table against it
    assert(plan.contains("BroadcastHashJoin"),
      s"chunk offsets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"offset attach regressed:\n$plan")
    // the frequency table feeds the offset agg AND the cumsum probe —
    // at runtime AQE must reuse the one shuffle (single executed
    // lineitem scan), which the final adaptive plan prints as a
    // reused stage
    val df = operators.Relational.equidepthHistogram(spark, sf)
    df.collect()
    val finalPlan = planOf(df)
    assert(finalPlan.contains("ReusedExchange") ||
        finalPlan.contains("ReusedQueryStage") ||
        "ShuffleQueryStage 0".r.findAllIn(finalPlan).length > 1,
      s"frequency-table exchange must be reused, not recomputed:\n$finalPlan")
  }

  test("e47 attribution: join-free LOCF — one user_id exchange, no join") {
    val plan = planOf(operators.Events.lastTouchAttribution(spark, sf))
    // the as-of must be the e13 window shape, NOT a clicks⋈purchases
    // join (whose output is clicks×purchases per user on dense
    // histories — the 10× probe measured 7.9× on the join form)
    assert(!plan.contains("Join"), s"attribution must not join:\n$plan")
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userEx == 1,
      s"expected one user_id exchange for the LOCF window, got $userEx:\n$plan")
  }

  test("d46 containment: counted overlap, no cartesian, no array shuffle") {
    val df = operators.TextOps.containmentDups(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must bucket on rare shingles:\n$plan")
    // the r14 count-based shape: overlap is a map-side-combined
    // hash-agg inside the pair join — per-doc shingle ARRAYS must
    // never ride an exchange (the r13 shape shipped two ~420 B arrays
    // per candidate pair: 96 GB of shuffle at the 100× probe)
    assert(!plan.contains("graft_sorted_isect"),
      s"overlap must be counted in the join, not array-intersected:\n$plan")
    val exchanges = "Exchange[^\n]*".r.findAllIn(plan).toSeq
    assert(!exchanges.exists(_.contains("hs")),
      s"per-doc shingle arrays must not be shuffled:\n${exchanges.mkString("\n")}")
  }

  test("d47 classifier: scoring is map work; ONE doc-key exchange") {
    val plan = planOf(operators.TextOps.classifierScore(spark, sf))
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    val ex = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(ex == 1, s"expected one doc_id exchange, got $ex:\n$plan")
    // map-side combine: a partial HashAggregate below the exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"per-doc agg must partial-aggregate map-side:\n$plan")
  }

  test("e48 paths: session agg rides the window's user_id exchange; top-20 bounded") {
    val plan = planOf(operators.Events.sessionPaths(spark, sf))
    assert(!plan.contains("Join"), s"path mining must not join:\n$plan")
    // hashpartitioning(user_id) satisfies the (user_id, sess) grouping,
    // so the window exchange is the ONLY event-keyed one; the second
    // exchange is the collapsed path histogram
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userEx == 1,
      s"expected one user_id exchange shared by window+session agg, got $userEx:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"head not a bounded TakeOrdered:\n$plan")
  }

  test("d43 drift: corpus counted once (checkpoint), grid joins broadcast") {
    val df = operators.TextOps.sourceDrift(spark, sf)
    df.collect()
    val plan = planOf(df)
    // the vocab aggregate is localCheckpointed: the final plan reads the
    // materialized RDD; the corpus parquet scan must not reappear
    assert(!plan.contains("Scan parquet"),
      s"corpus rescanned past the vocab checkpoint:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"drift grid must assemble by broadcast, not SMJ:\n$plan")
  }
}
