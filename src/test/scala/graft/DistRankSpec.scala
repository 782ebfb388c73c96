package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.operators.DistRank]] — the exact distributed ntile that
  * e50/e52 flip to above the stats threshold (round-9 verdict item 6:
  * the prose substitution made code). Both branches must be
  * bucket-identical over any total order, and the distributed plan must
  * actually be distributed: range exchange present, materialized ONCE
  * (exchange reuse — `spark_partition_id()` must mean the same slice on
  * the counts side and the rank side). */
class DistRankSpec extends AnyFunSuite {
  import graft.operators.DistRank
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def perUser = {
    import spark.implicits._
    Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("freq"))
  }

  test("distributed ntile == window ntile on the fixture for n in {4, 7, 10}") {
    import spark.implicits._
    val users = perUser
    for (n <- Seq(4, 7, 10)) {
      val order = Seq(desc("freq"), $"user_id")
      val plain = users.withColumn("b",
          ntile(n).over(Window.orderBy(order: _*)).cast("long"))
        .select($"user_id", $"b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val dist = DistRank.ntileDistributed(users, order, n, "b", parts = 8)
        .select($"user_id", $"b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist == plain, s"ntile($n) bucket assignment diverged")
    }
  }

  test("distributed ntile == window ntile at 100k rows with heavy ties") {
    import spark.implicits._
    // heavy ties on the primary key (1k distinct scores over 100k rows)
    // force bucket boundaries THROUGH tie groups; id breaks the tie, so
    // the order is total and both plans must agree exactly
    val big = spark.range(100000L).toDF("id")
      .withColumn("score", pmod(hash(col("id")), lit(1000)).cast("long"))
    val order = Seq(desc("score"), col("id"))
    val plain = big.withColumn("b",
        ntile(10).over(Window.orderBy(order: _*)).cast("long"))
      .select(col("id"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = DistRank.ntileDistributed(big, order, 10, "b", parts = 16)
      .select(col("id"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == plain, "bucket assignment diverged at 100k rows")
  }

  test("N < n edge: every row its own bucket, no division-by-zero") {
    import spark.implicits._
    val tiny = perUser.orderBy($"user_id").limit(3).select($"user_id")
    val got = DistRank.ntileDistributed(tiny, Seq($"user_id"), 10, "b",
        parts = 4)
      .orderBy($"user_id").select($"b").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("flip + plan shape: fixture stays one-window; forced path range-partitions and reuses the exchange") {
    import spark.implicits._
    val users = perUser
    val order = Seq(desc("freq"), $"user_id")
    // fixture-scale stats sit far below the default threshold → the
    // plain branch, whose plan has NO range exchange
    val small = DistRank.globalNtile(users, order, 4, "b")
    small.collect()
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(!smallPlan.contains("rangepartitioning"),
      s"small input unexpectedly took the distributed branch:\n$smallPlan")
    // threshold 0 forces the distributed branch
    val dist = DistRank.globalNtile(users, order, 4, "b",
      thresholdBytes = 0L)
    dist.collect()
    val distPlan = dist.queryExecution.executedPlan.toString
    assert(distPlan.contains("rangepartitioning"),
      s"forced distributed branch lost its range exchange:\n$distPlan")
    // the partitioned data must be materialized ONCE and read from
    // cache by every consumer — two independent materializations could
    // sample different range boundaries and mis-join the offsets
    // (exchange reuse alone was defeated by e52's shape at 100×, hence
    // the persist; the in-plan per-pid guard backstops it)
    assert(distPlan.contains("InMemoryTableScan") ||
        distPlan.contains("TableCacheQueryStage") ||
        distPlan.contains("InMemoryRelation"),
      s"partitioned data not pinned to one materialization:\n$distPlan")
  }
}
