package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api._

/** The Kafka-Streams-style DSL must reproduce the directly-written
  * DataFrame pipelines — a reference app migrated operator-by-operator
  * gets identical results. */
class KStreamsApiSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def events = Tables.events(spark, sf)

  test("stream → filter/mapValues/branch/merge keeps record semantics") {
    val s = GraftStreams.stream(events, "user_id", "ts")
    val Seq(views, purchases) = s.branch(
      col("event_type") === "view", col("event_type") === "purchase")
    val merged = views.merge(purchases)
      .mapValues("v2" -> col("value") * 2)
      .filterNot(col("value") < 0)
    val expected = events.filter(
      col("event_type") === "view" || col("event_type") === "purchase").count()
    assert(merged.toDF.count() == expected)
    assert(merged.toDF.columns.contains("v2"))
  }

  test("windowedBy tumbling count equals direct window aggregation") {
    val dsl = GraftStreams.stream(events, "user_id", "ts")
      .groupBy("event_type")
      .windowedBy("1 day")
      .count()
      .select(col("w_start"), col("event_type"), col("count"))
    val direct = events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("count"))
      .select(col("w.start").as("w_start"), col("event_type"), col("count"))
    assert(dsl.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(dsl).count() == 0)
  }

  test("table() compacts to latest-by-key (KTable semantics)") {
    // stream.toTable is the same compaction entered from a KStream
    val viaStream = GraftStreams.stream(events, "user_id", "ts").toTable
    assert(viaStream.toDF.count() ==
      events.select(col("user_id")).distinct().count())
    val t = GraftStreams.table(events, "user_id", "ts")
    val direct = graft.operators.Events.latestByKey(spark, sf)
    assert(t.toDF.count() == direct.count())
    val joined = t.toDF.select(col("user_id"), col("event_id"))
      .exceptAll(direct.select(col("user_id"), col("event_id")))
    assert(joined.count() == 0)
  }

  test("stream ⋈ globalTable is a broadcast join with no stream shuffle") {
    val orders = Tables.orders(spark, sf)
    val cust = GraftStreams.globalTable(Tables.customer(spark, sf), "c_custkey")
    val enriched = GraftStreams.stream(orders, "o_custkey", "o_orderdate")
      .join(cust)
    assert(enriched.toDF.count() == orders.count())
    val plan = enriched.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("joinWithin reproduces the interval join") {
    val s = GraftStreams.stream(
      events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts")), "user_id", "ts")
    val p = GraftStreams.stream(
      events.filter(col("event_type") === "purchase")
        .selectExpr("user_id", "ts AS pts"), "user_id", "pts")
    val n = s.joinWithin(p, "60 minutes")
      .filter(col("pts") >= col("ts")).count()
    assert(n == graft.operators.Events.viewToPurchase(spark, sf).count())
  }

  test("semiJoinWithin emits each matched left row once, output subset of left") {
    val s = GraftStreams.stream(
      events.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts")), "user_id", "ts")
    val p = GraftStreams.stream(
      events.filter(col("event_type") === "purchase")
        .selectExpr("user_id AS p_user", "ts AS pts"), "p_user", "pts")
    val semi = s.semiJoinWithin(p, "60 minutes")
    // semi keeps only LEFT columns and at most one row per left record
    assert(semi.columns.toSet == Set("event_id", "user_id", "ts"))
    val ids = semi.select(col("event_id")).collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length && ids.nonEmpty)
    // the symmetric window makes semi a superset of the forward-only
    // streaming s27 contract and a subset of all views
    val views = events.filter(col("event_type") === "view").count()
    assert(ids.length <= views)
  }

  test("leftJoinWithin keeps unmatched left rows null-padded") {
    val s = GraftStreams.stream(
      events.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts")), "user_id", "ts")
    val p = GraftStreams.stream(
      events.filter(col("event_type") === "purchase")
        .selectExpr("user_id AS p_user", "ts AS pts"), "p_user", "pts")
    val joined = s.leftJoinWithin(p, "60 minutes")
    val views = events.filter(col("event_type") === "view").count()
    // every left row survives (matched or null-padded) ...
    assert(joined.select("event_id").distinct().count() == views)
    // ... unmatched ones as null-padded rows ...
    assert(joined.filter(col("pts").isNull).count() > 0)
    // ... and the matched half is exactly the inner join
    assert(joined.filter(col("pts").isNotNull).count() ==
      s.joinWithin(p, "60 minutes").count())
  }

  test("outerJoinWithin pads both sides") {
    val s = GraftStreams.stream(
      events.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts")), "user_id", "ts")
    val p = GraftStreams.stream(
      events.filter(col("event_type") === "purchase")
        .selectExpr("event_id AS p_id", "user_id AS p_user", "ts AS pts"),
      "p_user", "pts")
    val joined = s.outerJoinWithin(p, "60 minutes")
    val views = events.filter(col("event_type") === "view").count()
    val purchases = events.filter(col("event_type") === "purchase").count()
    // full outer keeps every row of BOTH sides at least once
    assert(joined.filter(col("event_id").isNotNull)
      .select("event_id").distinct().count() == views)
    assert(joined.filter(col("p_id").isNotNull)
      .select("p_id").distinct().count() == purchases)
    // and pads each side where the other is missing
    assert(joined.filter(col("p_id").isNull).count() > 0)
    assert(joined.filter(col("event_id").isNull).count() > 0)
    assert(joined.filter(col("event_id").isNotNull && col("p_id").isNotNull)
      .count() == s.joinWithin(p, "60 minutes").count())
  }

  test("sessionWindowedBy matches session_window op") {
    val dsl = GraftStreams.stream(events, "user_id", "ts")
      .groupBy("user_id")
      .sessionWindowedBy("2 hours")
      .count()
    assert(dsl.count() == graft.operators.Events.sessionWindows(spark, sf).count())
  }

  test("KTable FK join (orders → customer)") {
    val o = GraftStreams.table(Tables.orders(spark, sf), "o_orderkey", "o_orderdate")
    val c = GraftStreams.table(
      Tables.customer(spark, sf).withColumn("v", lit(1)), "c_custkey", "v")
    val joined = o.join(c, onLeft = "o_custkey")
    assert(joined.toDF.count() == Tables.orders(spark, sf).count())
  }
  test("cogroup folds three branches into one aggregation pass") {
    val s = GraftStreams.stream(events, "user_id", "ts")
    def b(t: String, renames: (String, String)*) = {
      val df = renames.foldLeft(
        s.filter(col("event_type") === t).toDF.select(
          (col("user_id") +: renames.map(r => col(r._1))): _*)) {
        case (d, (from, to)) => d.withColumnRenamed(from, to)
      }
      GraftStreams.stream(df, "user_id", renames.head._2).groupByKey
    }
    val cg = b("view", "ts" -> "v_ts")
      .cogroup(b("click", "ts" -> "c_ts"))
      .cogroup(b("purchase", "ts" -> "p_ts"))
      .aggregate(
        count(col("v_ts")).as("n_views"),
        count(col("c_ts")).as("n_clicks"),
        count(col("p_ts")).as("n_purchases"))
    // semantics: equals the per-type pivot counts
    val direct = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
    assert(cg.exceptAll(direct).count() == 0 &&
      direct.exceptAll(cg).count() == 0)
    // plan: ONE aggregation exchange for all branches, not one per
    // branch (string match — AQE hides children from collect())
    val plan = cg.queryExecution.executedPlan.toString
    val nExchanges = "(?m)^\\s*\\+?-? ?:?\\s*Exchange ".r
      .findAllIn(plan).size
    assert(nExchanges == 1, s"expected a single shuffle:\n$plan")
    assert(plan.contains("Union"), s"expected a union shape:\n$plan")
  }

  test("KTable.groupBy().aggregate() re-aggregates the compacted view") {
    // latest event per user, re-keyed by event_type: the aggregate must
    // see each user's LATEST row only (table semantics), not every event
    val t = GraftStreams.table(events, "user_id", "ts")
    val agg = t.groupBy("event_type").agg(
      count(lit(1)).as("n_users"),
      sum(col("value")).as("sum_latest_value"))
    val direct = graft.operators.Events.latestByKey(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("value")).as("sum_latest_value"))
    assert(agg.exceptAll(direct).count() == 0 &&
      direct.exceptAll(agg).count() == 0)
    // totals across groups = number of distinct users, not event count
    assert(agg.agg(sum(col("n_users"))).head.getLong(0) ==
      events.select(col("user_id")).distinct().count())
  }

}
