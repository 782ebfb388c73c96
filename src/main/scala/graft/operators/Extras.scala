package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det
import graft.functions.Det.{dec4, dsum}

/** Remaining SURVEY §2 breadth: CUBE, the SQL entry surface with a
  * correlated subquery (Catalyst decorrelates it into a join), time-range
  * window frames, and the approximate sketches (HLL++ distinct,
  * approx quantiles) that back per-key cardinality at 100 TB — exact
  * `countDistinct` needs a full shuffle of the distinct pairs, while
  * HLL++ merges constant-size sketches map-side. The approx queries are
  * declared without oracle SQL (sketch results are engine-specific) and
  * take the driver's rows-only check; the exact counterparts are the
  * oracle-verified e09/q-series. */
object Extras {

  /** CUBE over (priority, status): all grouping-set combinations. */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n", $"sum_price")
      .orderBy($"priority", $"status")
  }

  /** SQL entry surface + correlated scalar subquery (decorrelated by
    * Catalyst into an aggregate-join): customers richer than their
    * nation's average balance. */
  def richCustomersSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer")
    Tables.nation(spark, sfDir).createOrReplaceTempView("graft_nation")
    spark.sql(
      """SELECT n_name, count(*) AS n_rich
        |FROM graft_customer c JOIN graft_nation n ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM graft_customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  /** Time-range window frame: per-user trailing-1-hour average. */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600L * 1000000L, 0)
    Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts",
        round(sum(dec4($"value")).over(w).cast("double") /
          count(lit(1)).over(w), 4).as("avg_1h"))
      .orderBy($"event_id")
  }

  /** HLL++ approximate distinct per event_type (rows-only check; the
    * exact version is e09). */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_users"),
        approx_count_distinct($"user_id", 0.005).as("approx_users_precise"))
      .orderBy($"event_type")
  }

  /** Approximate quantiles of line item prices (rows-only check). */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice",
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"))
      .select($"l_returnflag",
        $"pcts"(0).as("p50"), $"pcts"(1).as("p90"), $"pcts"(2).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** HLL sketch MERGEABILITY (Datasketches `hll_sketch_agg` /
    * `hll_union_agg`): build one sketch per (event_type, day), then
    * union the daily sketches into a per-type total estimate WITHOUT
    * rescanning rows — the pre-aggregated sketch-table pattern that
    * makes distinct counts cheap at 100 TB (a nightly job maintains
    * small per-partition sketches; any rollup is a union over them).
    * Rows-only driver check; the estimate-vs-exact bound is pinned in
    * `SketchBoundsSpec`. */
  def hllUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", window($"ts", "1 day").as("w"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    daily.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"),
        count(lit(1)).as("n_days"))
      .orderBy($"event_type")
  }

  /** Misra–Gries heavy hitters per event_type (k=8) via the typed
    * [[graft.functions.HeavyHittersAggregator]]: bounded-state top
    * users — the frequent-items sketch a high-load consumer keeps when
    * exact per-key counts no longer fit. Rows-only driver check
    * (counter values are merge-order-dependent); the order-independent
    * MG guarantee is pinned in `SketchBoundsSpec`. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mg = udaf(new graft.functions.HeavyHittersAggregator(8),
      org.apache.spark.sql.Encoders.scalaLong)
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(mg($"user_id").as("hh"))
      .select($"event_type", explode($"hh").as("h"))
      .select($"event_type", $"h.id".as("user_id"), $"h.min_count")
      .orderBy($"event_type", desc("min_count"), $"user_id")
  }

  /** Pivot → unpivot round trip: wide per-user activity profile melted
    * back to long form (user_id, event_type, n) including zero cells. */
  def userUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("view", "click", "purchase", "signup", "error")
    val wide = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
    wide.unpivot(Array($"user_id"), types.map(col).toArray,
        "event_type", "n")
      .orderBy($"user_id", $"event_type")
  }

  /** As-of join (temporal state lookup): each event joined to the
    * user's most recent signup at-or-before its timestamp. Expressed as
    * one `last_value(... ignore nulls)` window pass — the scale answer
    * for as-of joins: no range-join pair explosion, one sort per key
    * that AQE/exchange reuse can share with adjacent per-user ops. */
  def asofSignupState(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("last_signup_id",
        last(when($"event_type" === "signup", $"event_id"), ignoreNulls = true)
          .over(w))
      .filter($"event_type" =!= "signup")
      .select($"event_id", $"user_id", $"event_type", $"last_signup_id")
      .orderBy($"event_id")
  }

  /** EXACT percentiles (the oracle-checkable counterpart of the x02
    * sketch): linear-interpolated median/p90/p99 of extended price per
    * return flag — rank r = (n−1)·p over integer cents, interpolated
    * as the EXACT rational lo·(100−fn) + hi·fn over 100, rounded
    * half-up to cents in pure int64.
    *
    * Why not `percentile` ≡ `quantile_cont` (the original contract):
    * the two engines compute `lo + frac·(hi−lo)` with DIFFERENT double
    * expression trees, and when the true value sits exactly on a
    * `.xx5` cent boundary (frac = 0.5 between adjacent cents) the
    * last-ulp difference flips the 2-dp rounding — found by a full
    * sf0.001 sweep (one group's p50: 52724.24 vs .25). Integer
    * arithmetic is identical in both engines by construction. (q26's
    * count percentiles keep the quantile_cont contract: interpolants
    * of integer COUNTS with frac = k/100 have ≤ 2 exact decimals, so
    * its round(·, 2) has no boundary to straddle.)
    *
    * Scale note: this shape is also the scalable one — `percentile()`
    * buffers every value of a group in the aggregator, while the
    * rank window is a distributed per-group sort. */
  def exactPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wRank = Window.partitionBy($"l_returnflag").orderBy($"c")
    val wN = Window.partitionBy($"l_returnflag")
    val ks = Seq(50, 90, 99)
    val ranked = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
    def loIdx(k: Int) = Det.fdiv(($"n" - 1L) * k, lit(100L)) + 1L
    val agg = ranked.groupBy($"l_returnflag")
      .agg(max($"n").as("n"),
        ks.flatMap(k => Seq(
          max(when($"rn" === loIdx(k), $"c")).as(s"lo$k"),
          max(when($"rn" === least(loIdx(k) + 1L, $"n"), $"c")).as(s"hi$k")
        )): _*)
    def out(k: Int) = {
      val fn = pmod(($"n" - 1L) * k, lit(100L))
      val interp = col(s"lo$k") * (lit(100L) - fn) + col(s"hi$k") * fn
      // half-up to cents: (2·interp + 100) div 200, then dollars
      (Det.fdiv(interp * 2L + 100L, lit(200L)) / 100.0).as(s"p$k")
    }
    agg.select($"l_returnflag", out(50).as("p50"), out(90).as("p90"),
        out(99).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** Explicit GROUPING SETS (the third grouping-analytics shape next to
    * q07 ROLLUP / q13 CUBE): chosen subtotal combinations only, with the
    * grouping bitmask exposed. */
  def groupingSetsReturns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        graft.functions.Det.dsum($"l_quantity").as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"gid", $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  /** e37: blocked edit-distance entity resolution (the record-linkage /
    * author-dedup shape): candidate part-name pairs come ONLY from a
    * BLOCKING key (shared last name token) plus a length band (edit
    * distance ≥ |len(a) − len(b)|, so a band of 2 cannot lose a
    * distance-≤2 match — the standard admissible prune), then exact
    * `levenshtein` verifies candidates. Reported per block so the
    * output stays bounded.
    *
    * Scale design: never an all-pairs scan — the self-join keys on the
    * block, candidates are quadratic only WITHIN a block (the blocking
    * key is chosen for that), and the length band is pushed into the
    * join condition so banded non-candidates drop before the verify.
    * Skewed blocks at 100 TB get AQE skew-split or a second blocking
    * key (first-token bigram), both documented standard practice. */
  def fuzzyNameMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .select($"p_partkey".as("k"), $"p_name".as("name"),
        element_at(split($"p_name", " "), -1).as("block"),
        length($"p_name").as("len"))
    p.as("a").join(p.as("b"),
        $"a.block" === $"b.block" && $"a.k" < $"b.k" &&
          abs($"a.len" - $"b.len") <= 2)
      .withColumn("dist", levenshtein($"a.name", $"b.name"))
      .groupBy($"a.block".as("block"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when($"dist" <= 2, 1L).otherwise(0L)).as("n_match"))
      .orderBy($"block")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e37_fuzzy_match"     -> fuzzyNameMatch _,
    "q13_cube_orders"     -> cubeOrders _,
    "q14_correlated_sql"  -> richCustomersSql _,
    "q17_grouping_sets"   -> groupingSetsReturns _,
    "e11_moving_avg"      -> movingAvg _,
    "e17_exact_percentiles" -> exactPercentiles _,
    "x01_approx_distinct" -> approxDistinct _,
    "x02_approx_quantiles" -> approxQuantiles _,
    "x03_hll_union"       -> hllUnion _,
    "x04_heavy_hitters"   -> heavyHitters _,
    "e12_user_unpivot"    -> userUnpivot _,
    "e13_asof_signup"     -> asofSignupState _,
  )

  val oracles: Map[String, String] = Map(
    "e37_fuzzy_match" ->
      """WITH p AS (SELECT p_partkey AS k, p_name AS name,
        |  string_split(p_name, ' ')[-1] AS block,
        |  length(p_name) AS len FROM part)
        |SELECT a.block, count(*) AS n_cand,
        |  CAST(sum(CASE WHEN levenshtein(a.name, b.name) <= 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |FROM p a JOIN p b ON a.block = b.block AND a.k < b.k
        |  AND abs(a.len - b.len) <= 2
        |GROUP BY a.block ORDER BY a.block""".stripMargin,
    "q17_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |coalesce(l_linestatus, 'ALL') AS linestatus,
        |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |count(*) AS n,
        |round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    // integer-cents order statistics + exact rational interpolation
    // (see the Spark-side scaladoc for why quantile_cont was dropped:
    // cross-engine last-ulp divergence at .xx5 cent boundaries)
    "e17_exact_percentiles" -> {
      val ks = Seq(50, 90, 99)
      val picks = ks.map { k =>
        s"""  max(CASE WHEN rn = ((n-1)*$k // 100) + 1 THEN c END) AS lo$k,
           |  max(CASE WHEN rn = least(((n-1)*$k // 100) + 2, n) THEN c END) AS hi$k"""
          .stripMargin
      }.mkString(",\n")
      val outs = ks.map { k =>
        s"""  (((lo$k * (100 - ((n-1)*$k % 100)) + hi$k * ((n-1)*$k % 100))
           |    * 2 + 100) // 200) / 100.0 AS p$k""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT l_returnflag,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem),
         |r AS (SELECT l_returnflag, c,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
         |    count(*) OVER (PARTITION BY l_returnflag) AS n FROM b),
         |a AS (SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
         |$picks
         |  FROM r GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |$outs
         |FROM a ORDER BY l_returnflag""".stripMargin
    },
    "q13_cube_orders" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n,
        |round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q14_correlated_sql" ->
      """SELECT n_name, count(*) AS n_rich
        |FROM customer c JOIN nation n ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "e11_moving_avg" ->
      """SELECT event_id, user_id, ts,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |  / count(*) OVER w, 4) AS avg_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // x01/x02 deliberately omitted: sketch outputs are engine-specific
    "e12_user_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
        |c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
        |FROM u CROSS JOIN t
        |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,
    "e13_asof_signup" ->
      """SELECT event_id, user_id, event_type, last_signup_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id
        |  FROM events) t
        |WHERE event_type <> 'signup'
        |ORDER BY event_id""".stripMargin,
  )
}
