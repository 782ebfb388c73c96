package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det
import graft.functions.Det.{dec4, dsum}

/** Remaining SURVEY §2 breadth: CUBE, the SQL entry surface with a
  * correlated subquery (Catalyst decorrelates it into a join), time-range
  * window frames, and the approximate sketches (HLL distinct, binned
  * quantiles, frequent items) that back per-key cardinality at 100 TB —
  * exact `countDistinct` needs a full shuffle of the distinct pairs,
  * while HLL merges constant-size register tables map-side.
  *
  * ORACLE CLOSURE (r10 verdict item 1): through round 10 the four
  * sketch queries (x01–x04) rode engine-specific built-ins
  * (`approx_count_distinct`, `percentile_approx`, Datasketches HLL, a
  * Misra–Gries UDAF) whose outputs no other engine can replay, so they
  * took the driver's weaker rows-only check. Round 11 re-expresses each
  * as a DETERMINISTIC sketch over a fixed base hash (the d06 md5
  * seed-constant discipline): the register build, the merge, and the
  * estimate are explicit relational algebra + shared literal formulas,
  * so DuckDB replays the identical sketch verbatim and the full
  * rows+schema+hash gate closes over them. Same sketch THEORY, same
  * asymptotics, same merge-at-scale story — the only thing surrendered
  * is the black-box implementation. The engine-specific built-ins
  * remain pinned in SketchBoundsSpec as accuracy baselines. */
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

  // ---- deterministic HLL (x01/x03): m = 256 registers over a fixed
  // md5-derived 32-bit hash -------------------------------------------
  //
  // hash    h   = first 8 hex chars of md5(user_id as string) — the d06
  //               base-hash discipline; 32 bits, identical text in both
  //               engines
  // bucket      = h div 2²⁴ (top 8 bits → 256 registers)
  // rho         = leading-zero count of the low 24 bits + 1
  //             = 25 − bitlength(rem), via length(bin(rem)) — bin() is
  //               the no-leading-zeros binary string in BOTH engines,
  //               so the formula is engine-portable integer/text ops
  // register    = max(rho) per bucket — the HLL monoid (mergeable,
  //               map-side-combinable, constant 256·1 B per key)
  // estimate    = αₘ·m² / Z with Z = Σ 2^(−rho_j). Determinism: Z is
  //               computed as an INTEGER sum S = Σ 2^(25−rho) (empty
  //               registers contribute 2²⁵) divided ONCE by 2²⁵ — sum
  //               order cannot perturb an integer — and αₘ·m² is ONE
  //               shared literal, so the raw estimate is a single
  //               IEEE division with identical operands in both
  //               engines. Small-range (linear-counting) branch when
  //               eRaw ≤ 2.5m and empty registers exist: m·ln(m/V) —
  //               ln may differ in the last ulp across libms, so the
  //               surfaced estimate is ROUNDED TO AN INTEGER (a flip
  //               needs the true value within ~1e-13 of .5; verified
  //               stable at every fixture SF).

  private val HllM = 256L
  private val HllW = 1L << 24
  /** The INTEGER scale of the Z sum: S = Σ 2^(25−rho) means one unit of
    * Z is 2²⁵ (rho ranges 1..25, so 2^(25−rho) ∈ [1, 2²⁴] for occupied
    * registers and an EMPTY register's 2^(−0) = 1 contributes a full
    * 2²⁵). Distinct from [[HllW]] (the 24-bit rem space) — r11's code
    * review caught exactly this conflation: dividing by 2²⁴
    * double-weights occupied registers and halves the raw-branch
    * estimate (−50% at sf0.1), invisible to the oracle gate because
    * the SQL mirrored the same constant. SketchBoundsSpec now pins the
    * raw branch on a synthetic 5000-key input. */
  private val HllZ = 1L << 25
  /** αₘ·m² for m = 256, emitted as ONE literal into both engines via
    * toString (shortest round-trip repr; both parse back the identical
    * IEEE double). */
  private val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0

  /** Spark-side register build from `(event_type[, day], h)`:
    * bucket/rem split + rho. */
  private def hllRho: Column =
    when(col("rem") === 0L, lit(25L))
      .otherwise(lit(25L) - length(bin(col("rem"))).cast("long"))

  private val hllHashExpr =
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"

  /** The hash → register geometry (bucket = top 8 bits, rem = low 24) —
    * ONE definition for the fixture build and the synthetic accuracy
    * probe, so the part of the sketch that must stay bit-identical
    * cannot drift. */
  private def hllRegSplit(h: Column): Seq[Column] =
    Seq(Det.fdiv(h, lit(HllW)).as("bucket"), (h % HllW).as("rem"))

  private def hllHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        Det.fdiv(expr("unix_micros(ts)"), lit(86400000000L)).as("day"),
        expr(hllHashExpr).as("h"))
      .select(Seq($"event_type", $"day") ++ hllRegSplit($"h"): _*)
  }

  /** Global HLL estimate over an arbitrary `user_id` frame — exposed
    * for SketchBoundsSpec's RAW-branch accuracy pin: the fixture SF
    * (sf0.001, 15 distinct users) only ever exercises the
    * linear-counting branch, which is exactly how the r11 Z-scale bug
    * (HllW for HllZ, −50% raw estimates) survived every fixture
    * test. */
  private[graft] def hllEstimateOf(ids: DataFrame): Long = {
    import ids.sparkSession.implicits._
    val regs = ids.select(expr(hllHashExpr).as("h"))
      .select(hllRegSplit($"h"): _*)
      .groupBy($"bucket").agg(max(hllRho).as("rho"))
    hllReadout(regs, Nil, "est").select($"est").head().getLong(0)
  }

  /** The estimate readout from (occupied-register count, integer
    * register sum S = Σ 2^(25−rho) over occupied registers). */
  private def hllEst(nb: Column, s: Column): Column = {
    val z = (s + (lit(HllM) - nb) * lit(HllZ)) / lit(HllZ.toDouble)
    val eRaw = lit(HllAlphaM2) / z
    when(eRaw <= 640.0 && nb < HllM,
      round(lit(256.0) * log(lit(256.0) / (lit(HllM) - nb).cast("double"))))
      .otherwise(round(eRaw))
      .cast("long")
  }

  /** The register-table → (keys, n_buckets, S, estimate) readout — ONE
    * Spark definition shared by x01/x03/x06 (the r11 review's
    * drift-surface finding: the agg pair was inlined three times). The
    * input must have a `rho` column. */
  private def hllReadout(regs: DataFrame, keys: Seq[Column],
      out: String): DataFrame =
    regs.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - rho AS INT))"))
          .as("s"))
      .withColumn(out, hllEst(col("n_buckets"), col("s")))

  /** DuckDB mirrors of the above, shared by the x01/x03 oracle texts so
    * the two cannot drift. */
  private val hllRhoSql =
    "CASE WHEN rem = 0 THEN 25 ELSE 25 - length(bin(rem)) END"
  private val hllHashCte =
    s"""hh AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
       |  FROM events),
       |hb AS (SELECT event_type, day, h // $HllW AS bucket,
       |  h % $HllW AS rem FROM hh)""".stripMargin
  private def hllEstSql(nb: String, s: String): String = {
    val raw = s"($HllAlphaM2 / ((($s) + (256 - ($nb)) * $HllZ) / $HllZ.0))"
    s"""CAST(round(CASE WHEN $raw <= 640.0 AND ($nb) < 256
       |  THEN 256.0 * ln(256.0 / (256 - ($nb))) ELSE $raw END) AS BIGINT)"""
      .stripMargin
  }

  /** The register-table → readout CTE — the SQL face of [[hllReadout]],
    * shared by the x01/x03/x06 oracle texts. */
  private def hllReadoutCte(out: String, src: String,
      keys: Seq[String]): String = {
    val pos = (1 to keys.size).mkString(", ")
    s"""$out AS (SELECT ${keys.mkString(", ")}, count(*) AS n_buckets,
       |  CAST(sum(1::BIGINT << (25 - rho)) AS BIGINT) AS s
       |  FROM $src GROUP BY $pos)""".stripMargin
  }

  /** x01: HLL approximate distinct users per event_type — the
    * deterministic register sketch above, built as ONE map-side-
    * combined hash-agg over (type, bucket) (≤ 256 rows per key ever
    * shuffle — the whole point vs e09's exact distinct, which must
    * shuffle every distinct (type, user) pair) plus a ≤ 256-row
    * readout. At 100 TB the register table IS the state: constant
    * 256 bytes per key, mergeable across partitions/days/clusters
    * (x03 demonstrates the merge). Oracle: DuckDB replays the
    * identical registers and estimate (hash-gated since r11). */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val regs = hllHash(spark, sfDir)
      .groupBy($"event_type", $"bucket")
      .agg(max(hllRho).as("rho"))
    hllReadout(regs, Seq($"event_type"), "est_users")
      .select($"event_type", $"n_buckets", $"est_users")
      .orderBy($"event_type")
  }

  /** x02: binned approximate quantiles of lineitem extended price per
    * return flag — e54's fixed-width-bin discipline generalized to
    * arbitrary percentiles (p50/p90/p99): values land in $100 bins,
    * per-(flag, bin) counts are one map-side-combined hash-agg, the
    * cumsum window runs over BIN rows (≤ ~1100 per flag), and the
    * type-1 read-off target ⌈n·p/100⌉ interpolates inside the landing
    * bin exactly as e54's median does. Accuracy contract: within one
    * bin width of e17's exact interpolated percentiles
    * (SketchBoundsSpec pins it). All arithmetic is pure int64 until
    * the final cents→dollars [[Det.r4]]; the oracle replays the
    * identical formula (hash-gated since r11).
    *
    * Scale: this is the quantile shape that survives 100 TB — bin
    * counts are mergeable monoid state (s46 streams the same bins),
    * no per-group value sort ever happens, parallelism is bounded by
    * data not |groups|. */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val BinC = 10000L // $100 bins, integer cents
    val bins = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag",
        Det.fdiv(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"),
          lit(BinC)).as("bin"))
      .groupBy($"l_returnflag", $"bin")
      .agg(count(lit(1)).as("bc"))
    val w = Window.partitionBy($"l_returnflag").orderBy($"bin")
    val wN = Window.partitionBy($"l_returnflag")
    val cum = bins
      .withColumn("cum", sum($"bc").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"bc").over(wN))
    def centsAt(k: Int): Column = {
      val target = Det.fdiv($"n" * k + 99L, lit(100L)) // ceil(n·k/100)
      max(when($"cum" >= target && $"cum" - $"bc" < target,
        $"bin" * BinC +
          Det.fdiv((target - ($"cum" - $"bc")) * BinC, $"bc")))
    }
    cum.groupBy($"l_returnflag")
      .agg(max($"n").as("n"), centsAt(50).as("c50"), centsAt(90).as("c90"),
        centsAt(99).as("c99"))
      .select($"l_returnflag", $"n",
        Det.r4($"c50", lit(100L)).as("p50"),
        Det.r4($"c90", lit(100L)).as("p90"),
        Det.r4($"c99", lit(100L)).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** x03: HLL MERGEABILITY — the pre-aggregated sketch-table pattern
    * that makes distinct counts cheap at 100 TB: build one register
    * table per (event_type, day) (a nightly job maintains small
    * per-partition sketches), then union per-type by register-wise max
    * WITHOUT rescanning rows. max is the HLL monoid, so the merged
    * registers equal the direct x01 registers EXACTLY — which is
    * precisely the mergeability property, and what lets the oracle
    * replay the same daily-build + merge verbatim (hash-gated since
    * r11). */
  def hllUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = hllHash(spark, sfDir)
      .groupBy($"event_type", $"day", $"bucket")
      .agg(max(hllRho).as("rho"))
    val nDays = daily.groupBy($"event_type")
      .agg(countDistinct($"day").as("n_days"))
    val merged = daily.groupBy($"event_type", $"bucket")
      .agg(max($"rho").as("rho"))
    hllReadout(merged, Seq($"event_type"), "est_users")
      .join(broadcast(nDays), "event_type")
      .select($"event_type", $"n_days", $"est_users")
      .orderBy($"event_type")
  }

  /** x05: COUNT-MIN sketch point estimates (r11 — the frequency sketch
    * next to x01's cardinality sketch, same deterministic fixed-hash
    * discipline): d = 4 rows × w = 256 counters over row-salted md5
    * buckets (hash_r(u) = first 8 hex chars of md5("r:u") mod w — the
    * d06 seed-constant idiom, so DuckDB replays the identical
    * counters), built as ONE map-side-combined hash-agg over the ≤ d·w
    * cell table. Readout: for the top-10 users by exact count (the
    * bounded verification set — count desc, user_id tiebreak), the CMS
    * estimate = min over rows of the user's counter. The CMS guarantee
    * — never an underestimate, over by ≤ εN with ε = e/w — is pinned
    * in SketchBoundsSpec against the exact counts.
    *
    * Scale: the sketch is the 100 TB shape for per-key frequencies
    * when exact per-key counts no longer fit — constant d·w ints of
    * state, mergeable by cell-wise addition, one explode(d) pass over
    * events with full map-side combine; the probe is d point lookups
    * per queried key. */
  private[graft] val CmsW = 256L
  private[graft] val CmsD = 4

  /** The CMS bucket of `user_id` for sketch row `r` — row-salted md5,
    * ONE definition shared by the batch cell build (x05), the probe
    * read-off, and the s49 streaming ingest. */
  private[graft] def cmsBucket(r: Int): Column =
    expr(s"CAST(conv(substr(md5(concat('$r:', CAST(user_id AS STRING))), " +
      s"1, 8), 16, 10) AS BIGINT) % $CmsW")

  /** The x05 probe read-off over an EXPLICIT `cells(r, b, c)` counter
    * table — shared by x05 (batch-built cells) and s49 (cells served
    * out of streaming state), so the two faces cannot drift: top-10
    * users by exact count, estimate = min over rows of the user's
    * counter. */
  private[graft] def cmsProbe(spark: SparkSession, sfDir: String,
      cells: DataFrame): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select($"user_id")
    val probes = ev.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact"), $"user_id").limit(10)
    probes
      .select($"user_id", $"n_exact",
        posexplode(array((0 until CmsD).map(cmsBucket): _*))
          .as(Seq("r", "b")))
      .join(cells.select($"r".cast("int").as("r"), $"b", $"c"),
        Seq("r", "b"))
      .groupBy($"user_id")
      .agg(max($"n_exact").as("n_exact"), min($"c").as("n_cms"))
      .orderBy($"user_id")
  }

  def countMin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir).select($"user_id")
      .select(posexplode(array((0 until CmsD).map(cmsBucket): _*))
        .as(Seq("r", "b")))
      .groupBy($"r", $"b").agg(count(lit(1)).as("c"))
    cmsProbe(spark, sfDir, cells)
  }

  /** x06: HLL SET ALGEBRA (r11 — the payoff of x01/x03's register
    * discipline): distinct-user overlap between every event-type pair
    * WITHOUT rescanning rows — per-type register tables (x01's build)
    * merge by per-bucket max into the pair's UNION registers, and the
    * intersection estimate is inclusion–exclusion over the three
    * estimates: |A∩B| ≈ est(A) + est(B) − est(A∪B). The subtraction
    * runs over the already-ROUNDED integer estimates, so both engines
    * do identical int64 arithmetic — no new float surface. The estimate
    * is clamped at 0 (identically on both sides): for near-disjoint
    * sets, normal HLL error can drive inclusion–exclusion negative, and
    * a negative cardinality is never the right readout.
    *
    * Scale: this is why sketch tables exist at 100 TB — any of the
    * k·(k−1)/2 pairwise overlaps costs a 256-row register merge
    * instead of a distinct-pair shuffle over the raw events; the
    * nightly register table (x03) answers every such rollup. */
  def hllSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    hllSetOpsOf(hllHash(spark, sfDir)
      .groupBy($"event_type", $"bucket")
      .agg(max(hllRho).as("rho")))
  }

  /** The x06 plan over an explicit `(event_type, bucket, rho)` register
    * frame — split out (the spendConcentrationOf seam pattern) so
    * SketchBoundsSpec can force the inclusion–exclusion NEGATIVE branch
    * with synthetic near-disjoint registers, which no fixture SF
    * reaches (fixture event types share most users, so the raw
    * subtraction stays positive and the GREATEST(0, ·) clamp would
    * otherwise be a branch the 232/232 hash gate never executes). */
  private[graft] def hllSetOpsOf(regs: DataFrame): DataFrame = {
    import regs.sparkSession.implicits._
    def estOf(r: DataFrame, keys: Seq[Column], out: String): DataFrame =
      hllReadout(r, keys, out).drop("n_buckets", "s")
    val perType = estOf(regs, Seq($"event_type"), "est")
    val types = regs.select($"event_type").distinct()
    val pairs = types.select($"event_type".as("t1"))
      .join(types.select($"event_type".as("t2")), $"t1" < $"t2")
    val uniRegs = pairs.join(regs, $"t1" === $"event_type")
      .select($"t1", $"t2", $"bucket", $"rho")
      .union(pairs.join(regs, $"t2" === $"event_type")
        .select($"t1", $"t2", $"bucket", $"rho"))
      .groupBy($"t1", $"t2", $"bucket").agg(max($"rho").as("rho"))
    estOf(uniRegs, Seq($"t1", $"t2"), "est_union")
      .join(perType.select($"event_type".as("t1"), $"est".as("est_a")), "t1")
      .join(perType.select($"event_type".as("t2"), $"est".as("est_b")), "t2")
      .select($"t1".as("type_a"), $"t2".as("type_b"), $"est_a", $"est_b",
        $"est_union",
        // inclusion–exclusion can go NEGATIVE under normal HLL error for
        // near-disjoint sets; clamp at 0 (a cardinality) — mirrored in the
        // oracle so both sides do the identical int64 arithmetic
        greatest(lit(0L), $"est_a" + $"est_b" - $"est_union")
          .as("est_intersect"))
      .orderBy($"type_a", $"type_b")
  }

  /** x04: EXACT support-threshold heavy hitters per event_type — the
    * contract the Misra–Gries sketch approximates, declared exactly
    * (r10 verdict item 1's prescription: MG counter values are
    * merge-order-dependent, so the GATED query is the exact frequent-
    * items readout; the MG UDAF itself stays pinned in
    * SketchBoundsSpec, including its recall guarantee against THIS
    * query's output). Support threshold: count > 1.5× the mean
    * per-user count of the type (the fixture's activity is
    * near-uniform, so an absolute N/k support is degenerate at every
    * SF — the threshold is a contract parameter; the plan shape is
    * identical for any τ).
    *
    * Scale: one map-side-combined hash-agg over (type, user) — the
    * same shuffle e09 already pays — then a ≤ |types|-row totals
    * aggregate broadcast back; no sort, no window over data-sized
    * partitions. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.events(spark, sfDir)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n_events"))
    val s = c.groupBy($"event_type")
      .agg(sum($"n_events").as("tot"), count(lit(1)).as("nu"))
    c.join(broadcast(s), "event_type")
      .filter($"n_events" * 2L * $"nu" > $"tot" * 3L)
      .select($"event_type", $"user_id", $"n_events")
      .orderBy($"event_type", desc("n_events"), $"user_id")
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
    * Scale note (REPLANNED round 13 — the q26/q28 one-task-sort class,
    * caught by the full probe sweep): the original per-flag rank
    * window put each flag's WHOLE row set in one sort task
    * (parallelism = 3 flags; measured 42× warm at the 100× probe).
    * The ranks now read off the per-flag count-of-counts cumsum — the
    * q26/q27/d55/x02 frequency-table discipline, EXACT here because
    * the value at a rank is the sorted multiset's and cents are a
    * discrete domain: ONE map-side-combined hash-agg collapses the
    * fact to (flag, cents, f) — full parallelism where the rows are —
    * and the cumsum window runs over |distinct cents| per flag
    * (bounded by the price domain, the q27 note), never |rows|. The
    * lo/hi rank values come from the bucket whose [cum−f+1, cum]
    * range covers the target rank; interpolation arithmetic is
    * unchanged, so the output is value-identical to the window plan
    * (the GraftSpec sorted-array pin is the proof). */
  def exactPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ks = Seq(50, 90, 99)
    val freq = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
      .groupBy($"l_returnflag", $"c").agg(count(lit(1)).as("f"))
    val wFlag = Window.partitionBy($"l_returnflag")
    val ranked = freq
      .withColumn("cum", sum($"f").over(wFlag.orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"f").over(
        wFlag.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    def loIdx(k: Int) = Det.fdiv(($"n" - 1L) * k, lit(100L)) + 1L
    def covers(t: Column) = $"cum" >= t && $"cum" - $"f" < t
    val agg = ranked.groupBy($"l_returnflag")
      .agg(max($"n").as("n"),
        ks.flatMap(k => Seq(
          max(when(covers(loIdx(k)), $"c")).as(s"lo$k"),
          max(when(covers(least(loIdx(k) + 1L, $"n")), $"c")).as(s"hi$k")
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
    // r15 (measured, OPTIMIZATION_r15.md): the verify kernel is ~25M
    // candidate pairs × edit distance, and the block domain is TINY
    // (|last-name tokens| ≈ 8) — far fewer blocks than cores, so any
    // block-keyed distribution (or a single-split probe scan, the
    // local-fixture case) serializes the quadratic verify. Round-robin
    // repartition of the PROBE side of the broadcast join spreads pair
    // generation + verify evenly across the cluster regardless of the
    // block histogram — the guide §2.5 skew move for a broadcast join.
    // The verify itself uses the THRESHOLD form of levenshtein (banded
    // O(len·k) DP + length early-exit, -1 when dist > 2), which is
    // value-identical under the dist ≤ 2 predicate: 2.7 s → ~0.4 s.
    p.repartition(spark.sparkContext.defaultParallelism).as("a")
      .join(p.as("b"),
        $"a.block" === $"b.block" && $"a.k" < $"b.k" &&
          abs($"a.len" - $"b.len") <= 2)
      .withColumn("dist", levenshtein($"a.name", $"b.name", 2))
      .groupBy($"a.block".as("block"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when($"dist" >= 0, 1L).otherwise(0L)).as("n_match"))
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
    "x05_count_min"       -> countMin _,
    "x06_hll_setops"      -> hllSetOps _,
    "e12_user_unpivot"    -> userUnpivot _,
    "e13_asof_signup"     -> asofSignupState _,
  )

  private val D = Det.sql

  /** x05's FULL oracle text — shared VERBATIM with s49 (the streaming
    * count-min ingest, [[graft.streaming.StreamOps]]): the CMS cells
    * folded through streaming state must serve the batch truth (the
    * s48/v30 discipline applied to the frequency sketch). */
  private[graft] def countMinSql: String = {
    def bucket(pfx: String) =
      s"('0x' || substr(md5(r.r::VARCHAR || ':' || " +
        s"CAST(${pfx}user_id AS VARCHAR)), 1, 8))::BIGINT % $CmsW"
    s"""WITH ev AS (SELECT user_id FROM events),
       |rr AS (SELECT unnest(range($CmsD)) AS r),
       |cells AS (SELECT r.r AS r, ${bucket("ev.")} AS b, count(*) AS c
       |  FROM ev CROSS JOIN rr r GROUP BY 1, 2),
       |probes AS (SELECT user_id, count(*) AS n_exact FROM ev
       |  GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 10),
       |pe AS (SELECT p.user_id, p.n_exact, r.r AS r, ${bucket("p.")} AS b
       |  FROM probes p CROSS JOIN rr r)
       |SELECT pe.user_id, CAST(max(pe.n_exact) AS BIGINT) AS n_exact,
       |  CAST(min(c.c) AS BIGINT) AS n_cms
       |FROM pe JOIN cells c ON c.r = pe.r AND c.b = pe.b
       |GROUP BY 1 ORDER BY pe.user_id""".stripMargin
  }

  /** Oracle-text fragments this module shares VERBATIM between its
    * Spark-side formula and its DuckDB oracles (or across query
    * faces). FormulaAuditSpec scans every declared oracle for these:
    * any query whose oracle contains one is a SHARED-FORMULA oracle —
    * it proves cross-engine agreement, not correctness (the r11 HLL
    * 2²⁴/2²⁵ lesson) — and must carry a registry row pointing at an
    * independent-truth spec that exercises each formula branch. */
  private[graft] val sharedOracleFragments: Map[String, String] = Map(
    "hll-registers" -> hllHashCte,
    "hll-estimate" -> hllEstSql("n_buckets", "s"),
    "cms-cells" -> countMinSql)

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
    // x01–x04 gated since r11: deterministic fixed-hash sketches whose
    // register build / merge / estimate DuckDB replays verbatim (the
    // shared hllHashCte/hllRhoSql/hllEstSql fragments mirror the Spark
    // helpers one-for-one)
    "x01_approx_distinct" ->
      s"""WITH $hllHashCte,
         |hr AS (SELECT event_type, bucket, max($hllRhoSql) AS rho
         |  FROM hb GROUP BY 1, 2),
         |${hllReadoutCte("ha", "hr", Seq("event_type"))}
         |SELECT event_type, n_buckets,
         |${hllEstSql("n_buckets", "s")} AS est_users
         |FROM ha ORDER BY event_type""".stripMargin,
    "x03_hll_union" ->
      s"""WITH $hllHashCte,
         |hd AS (SELECT event_type, day, bucket, max($hllRhoSql) AS rho
         |  FROM hb GROUP BY 1, 2, 3),
         |nd AS (SELECT event_type, count(DISTINCT day) AS n_days
         |  FROM hd GROUP BY 1),
         |hm AS (SELECT event_type, bucket, max(rho) AS rho
         |  FROM hd GROUP BY 1, 2),
         |${hllReadoutCte("ha", "hm", Seq("event_type"))}
         |SELECT ha.event_type, nd.n_days,
         |${hllEstSql("n_buckets", "s")} AS est_users
         |FROM ha JOIN nd ON ha.event_type = nd.event_type
         |ORDER BY ha.event_type""".stripMargin,
    // binned type-1 quantiles, e54's formula at p50/p90/p99; every
    // operand non-negative so bare // is safe (the d-series precedent)
    "x02_approx_quantiles" -> {
      def centsAt(k: Int) =
        s"""max(CASE WHEN cum >= (n*$k+99)//100 AND cum - bc < (n*$k+99)//100
           |  THEN bin*10000 + ((n*$k+99)//100 - (cum - bc)) * 10000 // bc
           |  END) AS c$k""".stripMargin
      s"""WITH b AS (SELECT l_returnflag,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 10000 AS bin,
         |    count(*) AS bc FROM lineitem GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, bin, bc,
         |    sum(bc) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
         |    sum(bc) OVER (PARTITION BY l_returnflag) AS n FROM b),
         |a AS (SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
         |    ${centsAt(50)}, ${centsAt(90)}, ${centsAt(99)}
         |  FROM c GROUP BY 1)
         |SELECT l_returnflag, n, ${D.r4("c50", "100")} AS p50,
         |  ${D.r4("c90", "100")} AS p90, ${D.r4("c99", "100")} AS p99
         |FROM a ORDER BY l_returnflag""".stripMargin
    },
    // row-salted md5 counters (d=4 × w=256), min over rows at the
    // probe — the identical cell table both engines build
    "x05_count_min" -> countMinSql,
    // per-type registers (x01's hr CTE), pairwise max-merged union
    // registers, inclusion-exclusion over the ROUNDED integer estimates
    "x06_hll_setops" ->
      s"""WITH $hllHashCte,
         |hr AS (SELECT event_type, bucket, max($hllRhoSql) AS rho
         |  FROM hb GROUP BY 1, 2),
         |${hllReadoutCte("ha", "hr", Seq("event_type"))},
         |et AS (SELECT event_type,
         |  ${hllEstSql("n_buckets", "s")} AS est FROM ha),
         |pr AS (SELECT a.event_type AS t1, b.event_type AS t2
         |  FROM (SELECT DISTINCT event_type FROM hr) a
         |  JOIN (SELECT DISTINCT event_type FROM hr) b
         |  ON a.event_type < b.event_type),
         |ur AS (SELECT t1, t2, bucket, max(rho) AS rho FROM (
         |    SELECT pr.t1, pr.t2, hr.bucket, hr.rho FROM pr
         |      JOIN hr ON hr.event_type = pr.t1
         |    UNION ALL
         |    SELECT pr.t1, pr.t2, hr.bucket, hr.rho FROM pr
         |      JOIN hr ON hr.event_type = pr.t2) z
         |  GROUP BY 1, 2, 3),
         |${hllReadoutCte("ua", "ur", Seq("t1", "t2"))},
         |ue AS (SELECT t1, t2,
         |  ${hllEstSql("n_buckets", "s")} AS est_union FROM ua)
         |SELECT ue.t1 AS type_a, ue.t2 AS type_b, ea.est AS est_a,
         |  eb.est AS est_b, ue.est_union,
         |  GREATEST(0, ea.est + eb.est - ue.est_union) AS est_intersect
         |FROM ue JOIN et ea ON ea.event_type = ue.t1
         |JOIN et eb ON eb.event_type = ue.t2
         |ORDER BY type_a, type_b""".stripMargin,
    "x04_heavy_hitters" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, sum(n_events) AS tot, count(*) AS nu
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, c.user_id, c.n_events
        |FROM c JOIN s ON c.event_type = s.event_type
        |WHERE c.n_events * 2 * s.nu > s.tot * 3
        |ORDER BY c.event_type, c.n_events DESC, c.user_id""".stripMargin,
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
