package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det

/** Exact global ranking without a single-partition sort.
  *
  * `ntile(n) OVER (ORDER BY <total order>)` plans as ONE window
  * partition — a single-task sort of the whole input, the scale ceiling
  * e50/e52's scaladocs name ("at 10⁹ users…"). This helper computes the
  * IDENTICAL bucket assignment distributively:
  *
  *   1. `repartitionByRange(P, order)` — the parallel cluster-wide sort
  *      (partition i holds a contiguous slice of the total order). The
  *      partition count is EXPLICIT, so AQE never coalesces it
  *      (user-specified numPartitions is preserved) and the partition →
  *      slice mapping is stable within the plan.
  *   2. per-partition row counts → prefix-sum offsets: a ≤ P row
  *      aggregate, cumulated by a window over that TINY table and
  *      broadcast back. The partitioned data is PERSISTED so every
  *      consumer reads ONE materialization and `spark_partition_id()`
  *      means the same slice on all sides (DistRankSpec pins the
  *      cache scan in the physical plan) — ReuseExchange alone is not
  *      enough: a plan embedding the ranked subtree twice (e52's
  *      totals branch) defeated it at the 100× probe and two
  *      materializations sampled different boundaries. Should the
  *      invariant ever break anyway, a per-pid count cross-check
  *      welded into the rank expression raises at runtime instead of
  *      mis-ranking (see [[globalRowNumber]]).
  *   3. global rank = intra-partition row_number + partition offset
  *      (the row_number window partitions by pid — P-way parallel).
  *   4. the SQL-standard ntile readout from (rank, N): with q = N div n
  *      and m = N mod n, the first m buckets take q+1 rows, the rest q.
  *
  * Over a TOTAL order (no ties by construction) both code paths produce
  * byte-identical buckets, so the data — not the query author — picks
  * the physical plan (the statsDrivenJoin precedent) and the oracle
  * cannot tell them apart. */
object DistRank {

  /** Exact global `row_number()` over `order` (a total order), computed
    * with the distributed plan above. Adds LongType columns `out` (the
    * 1-based global rank) and `totalOut` (the grand row count, on every
    * row) — the (rank, N) pair every order-statistic readout consumes
    * (ntile below, e55's percentile read-off, e56's Lorenz curve). */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
      totalOut: String, parts: Int = 32): DataFrame = {
    // PERSIST the partitioned data: `spark_partition_id()` is only
    // meaningful if the range exchange materializes ONCE for every
    // consumer. ReuseExchange usually guarantees that, but a plan that
    // embeds the ranked subtree twice (e52's totals branch) defeated
    // it at the 100× probe — two materializations sampled different
    // boundaries and the runtime guard below fired. The cache pins one
    // materialization for all consumers; eviction is safe (a recomputed
    // partition re-fetches the SAME map outputs — boundaries are fixed
    // when the partitioner is built, before the map stage runs).
    //
    // RETENTION (r10 ADVICE, intentional): the cache is NOT explicitly
    // unpersisted — the returned DataFrame is lazy, so there is no
    // "after the action" point inside this helper, and an eager
    // unpersist would re-open the double-materialization hazard for a
    // caller that consumes the result twice (e52's totals branch).
    // Cleanup is Spark's own: MEMORY_AND_DISK blocks are LRU-evicted
    // under pressure (safe per the note above), and the ContextCleaner
    // drops the entry once the plan is no longer referenced. A
    // long-lived session ranking many distinct subtrees pays bounded
    // storage, never correctness.
    val parted = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // prefix offsets + grand total over ≤ `parts` rows — the one place a
    // single-partition window is CORRECT at any scale
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalOut, sum(col("__cnt")).over(
        Window.orderBy(col("__pid")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__off"), col("__cnt"), col(totalOut))
    val wIn = Window.partitionBy(col("__pid")).orderBy(order: _*)
    // RUNTIME GUARD against the one silent-wrong-answer mode: if the
    // counts subtree and the rank subtree ever materialized the range
    // exchange separately (exchange reuse disabled or defeated), their
    // sampled boundaries could differ and __pid would mean different
    // slices on each side. Cross-check the broadcast count against a
    // count window riding the SAME sort as row_number (no extra
    // exchange): under a TOTAL order, per-pid counts matching on every
    // pid forces identical split POSITIONS in the sorted multiset —
    // equal counts ⇒ equal slices ⇒ correct ranks — so any divergence
    // raises instead of mis-ranking. The guard lives INSIDE the rank
    // expression so the optimizer cannot prune it.
    //
    // The offsets join is LEFT OUTER (r10 ADVICE): an inner join would
    // silently DROP rank-side rows whose __pid the counts side left
    // empty — precisely a boundary divergence — before the count
    // cross-check could see them. With the left join such rows arrive
    // with __cnt null and the first branch raises. Completeness: both
    // materializations hold all N rows, so if every rank-side pid is
    // matched (no null) AND per-pid counts agree, the counts side's
    // total over those pids is already its grand total — it cannot
    // hide an extra non-empty pid — hence no separate grand-total
    // check is needed.
    val guarded = when(col("__cnt").isNull,
        raise_error(lit("DistRank: rank-side rows landed in a partition " +
          "the counts subtree left empty (range-exchange boundaries " +
          "diverged) — ranks would be wrong")).cast("long"))
      .when(count(lit(1)).over(Window.partitionBy(col("__pid")))
        === col("__cnt"), lit(0L))
      .otherwise(raise_error(lit("DistRank: range-exchange boundaries " +
        "diverged between the counts and rank subtrees (exchange reuse " +
        "defeated) — ranks would be wrong")).cast("long"))
    parted
      .join(broadcast(offsets), Seq("__pid"), "left")
      .withColumn(out,
        row_number().over(wIn).cast("long") + col("__off") + guarded)
      .drop("__pid", "__off", "__cnt")
  }

  /** The SQL-standard ntile readout as a pure Column: the bucket of
    * 1-based rank `r` among `nTotal` rows cut into `n` buckets (the
    * first nTotal mod n buckets take one extra row). CaseWhen
    * short-circuits per row, so the q=0 division in the
    * otherwise-branch is never evaluated when nTotal < n. */
  def ntileOf(r: Column, nTotal: Column, n: Int): Column = {
    require(n > 0, s"ntile($n)")
    val q = Det.fdiv(nTotal, lit(n.toLong))
    val m = nTotal % n.toLong
    val bigRows = m * (q + lit(1L)) // rows covered by the q+1-sized buckets
    when(r <= bigRows, Det.fdiv(r - 1L, q + lit(1L)) + 1L)
      .otherwise(m + Det.fdiv(r - bigRows - 1L, q) + 1L)
  }

  /** ntile(n) over `order` computed from [[globalRowNumber]]'s (rank, N).
    * Adds LongType column `out`; `order` must be a total order. */
  def ntileDistributed(df: DataFrame, order: Seq[Column], n: Int,
      out: String, parts: Int = 32): DataFrame =
    globalRowNumber(df, order, "__r", "__nt", parts)
      .withColumn(out, ntileOf(col("__r"), col("__nt"), n))
      .drop("__nt", "__r")

  /** Statistics-driven global ntile: below `thresholdBytes` (default 64 MiB — calibrated so the 100x probe fixtures, ~100 MB estimated, take the distributed branch while all base fixtures stay on the one-window plan) of estimated
    * input (Catalyst logical stats — free, no job) the plain one-window
    * plan is cheaper (no second exchange, no offsets pass); above it the
    * distributed plan is the only one that finishes. Both branches are
    * exact and bucket-identical. */
  def globalNtile(df: DataFrame, order: Seq[Column], n: Int, out: String,
      thresholdBytes: Long = 64L << 20, parts: Int = 32): DataFrame = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes > thresholdBytes) ntileDistributed(df, order, n, out, parts)
    else df.withColumn(out,
      ntile(n).over(Window.orderBy(order: _*)).cast("long"))
  }
}
