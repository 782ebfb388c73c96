package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics queries a high-load event-stream app computes
  * continuously: windowed ranking (trending), cohort retention, and an
  * ordered conversion funnel. All expressed as plain grouped/windowed
  * relational plans — each is a KTable the streaming runtime would keep
  * updated; here they are oracle-verified in batch form.
  *
  * Scale notes: everything keys on (day|cohort|user) — high-cardinality,
  * map-side-combined aggregations; the funnel's per-user stage
  * timestamps come from one conditional aggregation pass (no joins). */
object EventAnalytics {

  /** Top-2 event types per day by volume (windowed group ranking). */
  def dailyTopTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"day").orderBy(desc("n"), $"event_type")
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"day", $"rn".cast("long").as("rn"), $"event_type", $"n")
      .orderBy($"day", $"rn")
  }

  /** Cohort retention: users grouped by first-seen day; retained =
    * active again within the 7 days after the cohort day. */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    retentionCohortsFrom(Tables.events(spark, sfDir)
      .select($"user_id", date_trunc("day", $"ts").as("day")))
  }

  /** e15's rollup over an EXPLICIT `(user_id, day)` activity table —
    * the seam GraftSpec uses to exercise the not-retained branch and
    * the exact (cohort, cohort+7d] bounds, which the dense fixtures
    * never reach (every fixture user is retained at every SF). */
  private[graft] def retentionCohortsFrom(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val cohort = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val retained = e.join(cohort, "user_id")
      .filter($"day" > $"cohort_day" &&
        $"day" <= $"cohort_day" + expr("INTERVAL 7 DAYS"))
      .select($"user_id").distinct()
      .withColumn("is_retained", lit(1L))
    cohort.join(retained, Seq("user_id"), "left")
      .groupBy($"cohort_day")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce($"is_retained", lit(0L))).as("n_retained"))
      .orderBy($"cohort_day")
  }

  /** Ordered conversion funnel signup → view → purchase: stage
    * timestamps per user from ONE conditional-aggregation pass, stage
    * reached only if it happened after the previous stage. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", $"ts")).as("t_signup"),
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
      .select(
        when($"t_signup".isNotNull, 1L).otherwise(0L).as("s1"),
        when($"t_signup".isNotNull && $"t_view" > $"t_signup", 1L)
          .otherwise(0L).as("s2"),
        when($"t_signup".isNotNull && $"t_view" > $"t_signup" &&
          $"t_purchase" > $"t_view", 1L).otherwise(0L).as("s3"))
      .agg(count(lit(1)).as("n_users"),
        sum($"s1").as("n_signup"),
        sum($"s2").as("n_signup_view"),
        sum($"s3").as("n_signup_view_purchase"))
  }

  /** Event-transition matrix: per user, each event's successor type
    * (lead over (ts, event_id)); counts per (from, to) pair plus the
    * exact transition probability — Markov-chain path analytics over
    * the event stream. One window pass + one hash-agg; the probability
    * rounds in exact integer arithmetic (counts over row totals). */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("from_type"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy($"from_type").agg(sum($"n").as("row_total"))
    pairs.join(totals, "from_type")
      .select($"from_type", $"to_type", $"n",
        graft.functions.Det.r4($"n", $"row_total").as("p"))
      .orderBy($"from_type", $"to_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e14_daily_top_types" -> dailyTopTypes _,
    "e15_retention"       -> retentionCohorts _,
    "e16_funnel"          -> funnel _,
    "e20_transitions"     -> transitions _,
  )

  val oracles: Map[String, String] = Map(
    "e20_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM c GROUP BY from_type)
        |SELECT from_type, to_type, n,
        |((n * 20000 + row_total) // (row_total * 2)) / 10000.0 AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "e14_daily_top_types" ->
      """SELECT day, rn, event_type, n FROM (
        |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
        |    row_number() OVER (PARTITION BY date_trunc('day', ts)
        |      ORDER BY count(*) DESC, event_type) AS rn
        |  FROM events GROUP BY 1, 2) t
        |WHERE rn <= 2 ORDER BY day, rn""".stripMargin,
    "e15_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |retained AS (SELECT DISTINCT e.user_id
        |  FROM e JOIN cohort USING (user_id)
        |  WHERE e.day > cohort_day AND e.day <= cohort_day + INTERVAL 7 DAY)
        |SELECT cohort_day, count(*) AS n_users,
        |CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
        |FROM cohort c LEFT JOIN retained r ON c.user_id = r.user_id
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,
    "e16_funnel" ->
      """WITH stages AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
        |CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
        |  AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view_purchase
        |FROM stages""".stripMargin,
  )
}
