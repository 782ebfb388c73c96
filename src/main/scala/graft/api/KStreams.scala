package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kafka-Streams-shaped DSL over Spark DataFrames — the migration
  * surface for an app built on the `org.apache.kafka.streams.kstream`
  * API (the reference's programming model, SURVEY.md §2). Every DSL
  * operator maps to a declarative DataFrame transform, so Catalyst
  * optimizes the whole topology instead of executing node-by-node.
  *
  * The same pipeline code runs in batch (DataFrame from `read`) and
  * streaming (from `readStream`) — the Kafka Streams KStream/KTable
  * duality becomes Spark's batch/streaming unification. Stateful ops
  * (windowedBy/count/reduce) become streaming aggregations with
  * watermarks when the input is a stream.
  *
  * | Kafka Streams            | here                                  |
  * |--------------------------|---------------------------------------|
  * | builder.stream(topic)    | GraftStreams.stream(df, key, ts)      |
  * | builder.table(topic)     | GraftStreams.table(df, key, ts)       |
  * | builder.globalTable(t)   | GraftStreams.globalTable(df, key)     |
  * | filter/filterNot         | KStreamG.filter/filterNot             |
  * | map/mapValues            | KStreamG.mapValues (withColumn)       |
  * | flatMapValues            | KStreamG.flatMapValues (explode)      |
  * | selectKey                | KStreamG.selectKey (+ later shuffle)  |
  * | branch/split             | KStreamG.branch                       |
  * | merge                    | KStreamG.merge (unionByName)          |
  * | repartition              | KStreamG.repartition                  |
  * | groupByKey               | KStreamG.groupByKey                   |
  * | windowedBy(TimeWindows)  | KGroupedG.windowedBy(size[, slide])   |
  * | windowedBy(SessionW.)    | KGroupedG.sessionWindowedBy(gap)      |
  * | count/reduce/aggregate   | KGroupedG/WindowedG.agg               |
  * | KStream⋈KStream(JoinW.)  | KStreamG.joinWithin(other, Δt)        |
  * | KStream⋈KTable           | KStreamG.join(KTableG)                |
  * | KStream⋈GlobalKTable     | KStreamG.join(GlobalKTableG)          |
  * | KTable⋈KTable            | KTableG.join(KTableG)                 |
  * | to(topic)                | KStreamG.to(path) / toStream sink     |
  */
object GraftStreams {
  /** Record stream: every row is an event with a key and event time. */
  def stream(df: DataFrame, keyCol: String, tsCol: String): KStreamG =
    KStreamG(df, keyCol, tsCol)

  /** Changelog table: latest row per key (KTable semantics). For batch
    * inputs this compacts immediately; for streams, aggregate with
    * max-by in update/complete mode. */
  def table(df: DataFrame, keyCol: String, tsCol: String): KTableG = {
    val cols = df.columns.filter(c => c != keyCol).map(col)
    val compacted =
      if (df.isStreaming)
        df.groupBy(col(keyCol))
          .agg(max(struct(col(tsCol) +: cols.filter(_ != col(tsCol)): _*)).as("m"))
          .select(col(keyCol) +: df.columns.filter(_ != keyCol)
            .map(c => col(s"m.$c").as(c)): _*)
      else {
        // tiebreak on the remaining columns (desc, in struct order) so a
        // duplicate-timestamp key deterministically keeps the same row as
        // the streaming struct-max branch above
        val w = Window.partitionBy(col(keyCol))
          .orderBy((col(tsCol) +: cols.filter(_ != col(tsCol))).map(_.desc): _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    KTableG(compacted, keyCol)
  }

  /** Fully-replicated lookup table → broadcast side of every join. */
  def globalTable(df: DataFrame, keyCol: String): GlobalKTableG =
    GlobalKTableG(df, keyCol)
}

/** KStream: unbounded (or batch) record stream keyed by `key`. */
final case class KStreamG(df: DataFrame, key: String, ts: String) {
  private def withDf(d: DataFrame): KStreamG = copy(df = d)

  def filter(cond: Column): KStreamG = withDf(df.filter(cond))
  def filterNot(cond: Column): KStreamG = withDf(df.filter(!cond))

  /** mapValues: add/replace value columns (keys untouched → no shuffle). */
  def mapValues(cols: (String, Column)*): KStreamG =
    withDf(cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  /** flatMapValues: one record → many via explode of `gen`. */
  def flatMapValues(outCol: String, gen: Column): KStreamG =
    withDf(df.withColumn(outCol, explode(gen)))

  /** selectKey: re-key the stream. The shuffle happens lazily at the
    * next stateful op (Kafka Streams' repartition-topic, Spark's
    * exchange — same thing, but Catalyst can elide it). */
  def selectKey(newKey: String, expr: Column): KStreamG =
    KStreamG(df.withColumn(newKey, expr), newKey, ts)

  /** branch/split: one pass, N predicate-filtered children. */
  def branch(preds: Column*): Seq[KStreamG] = preds.map(p => withDf(df.filter(p)))

  def merge(other: KStreamG): KStreamG = withDf(df.unionByName(other.df))

  def repartition(n: Int): KStreamG = withDf(df.repartition(n, col(key)))

  def groupByKey: KGroupedG = KGroupedG(df, Seq(key), ts)
  def groupBy(cols: String*): KGroupedG = KGroupedG(df, cols, ts)

  /** KStream⋈KStream within ±Δt (JoinWindows): equi-key + time-range
    * condition; with streaming inputs both sides need watermarks.
    * `how` covers the full Kafka Streams join family: "inner" (join),
    * "left_outer" (leftJoin — null-padded left rows emitted once the
    * watermark closes their join window), "full_outer" (outerJoin). */
  def joinWithin(other: KStreamG, within: String,
      how: String = "inner"): DataFrame = {
    val l = df.alias("l")
    val r = other.df.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.${other.key}") &&
        col(s"r.${other.ts}") >= col(s"l.$ts") - expr(s"INTERVAL $within") &&
        col(s"r.${other.ts}") <= col(s"l.$ts") + expr(s"INTERVAL $within"),
      how)
  }

  /** KStream.leftJoin(other, JoinWindows.ofTimeDifference(Δt)). */
  def leftJoinWithin(other: KStreamG, within: String): DataFrame =
    joinWithin(other, within, "left_outer")

  /** KStream.outerJoin(other, JoinWindows.ofTimeDifference(Δt)). */
  def outerJoinWithin(other: KStreamG, within: String): DataFrame =
    joinWithin(other, within, "full_outer")

  /** The windowed EXISTS (Kafka Streams spells it join + distinct by
    * left key): each left record once if ANY right record lands in its
    * window — match-bit state only, output ⊆ left. The streaming face
    * is s27 ([[graft.streaming.StreamOps.viewPurchaseSemiJoin]]). */
  def semiJoinWithin(other: KStreamG, within: String): DataFrame =
    joinWithin(other, within, "left_semi")

  /** KStream⋈KTable: enrich each record with the latest table state.
    * The output keeps the STREAM's key (the table's key column is
    * dropped by reference, so a same-named stream key is untouched) —
    * matching Kafka Streams, where the joined stream stays keyed by the
    * stream side. */
  def join(table: KTableG, how: String = "inner"): KStreamG =
    withDf(df.join(table.df, df(key) === table.df(table.key), how)
      .drop(table.df(table.key)))

  /** KStream⋈GlobalKTable: broadcast lookup join, never shuffles the
    * stream side. */
  def join(g: GlobalKTableG): KStreamG =
    withDf(df.join(broadcast(g.df), df(key) === g.df(g.key))
      .drop(g.df(g.key)))

  /** KStream.toTable (DSL 2.5+): reinterpret the record stream as a
    * changelog — latest row per key wins (same compaction as
    * `GraftStreams.table`). */
  def toTable: KTableG = GraftStreams.table(df, key, ts)

  /** Sink (`to(topic)`): parquet in the sandbox, kafka in production. */
  def to(path: String): Unit = df.write.mode("overwrite").parquet(path)

  def toDF: DataFrame = df
}

/** Grouped stream: aggregation entry point (KGroupedStream). */
final case class KGroupedG(df: DataFrame, keys: Seq[String], ts: String) {
  def count(): DataFrame =
    df.groupBy(keys.map(col): _*).agg(sparkCount(lit(1)).as("count"))

  def agg(aggs: Column*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** Kafka Streams `cogroup` (DSL 2.5+): start folding this grouped
    * stream with others keyed the same way into one aggregation. */
  def cogroup(other: KGroupedG): CogroupedG = CogroupedG(Seq(this, other))

  /** Tumbling or hopping windows (TimeWindows[.advanceBy]). */
  def windowedBy(size: String, slide: Option[String] = None): WindowedG = {
    val w = slide.fold(window(col(ts), size))(s => window(col(ts), size, s))
    WindowedG(df, keys, w)
  }

  /** Session windows (SessionWindows.ofInactivityGap). */
  def sessionWindowedBy(gap: String): WindowedG =
    WindowedG(df, keys, session_window(col(ts), gap))

  private def sparkCount(c: Column) = org.apache.spark.sql.functions.count(c)
}

/** CogroupedKStream: N co-keyed grouped streams aggregated in ONE pass.
  *
  * Spark-first shape: `unionByName(allowMissingColumns = true)` (each
  * branch's value columns null-pad on the others' rows) followed by a
  * SINGLE `groupBy` — one shuffle, map-side combined, with each
  * branch's aggregates (`sum`/`count(col)`/`min`/`max` skip nulls)
  * seeing only its own rows. The naive port — aggregate each stream
  * separately, then join N results — pays N shuffles plus an N−1-way
  * join; the union shape is what Kafka Streams' single shared-store
  * update loop becomes declaratively, and it scales as one combined
  * aggregation regardless of branch count. Branches must use DISTINCT
  * value-column names (a shared name would merge their rows). */
final case class CogroupedG(branches: Seq[KGroupedG]) {
  def cogroup(other: KGroupedG): CogroupedG = copy(branches = branches :+ other)

  /** Terminal aggregate over the union schema (Cogrouped.aggregate). */
  def aggregate(aggs: Column*): DataFrame = {
    val keys = branches.head.keys
    // a branch keyed by a DIFFERENT column name would null-pad the key
    // under unionByName and silently collapse into one null-key group —
    // fail loudly instead (Kafka Streams enforces co-partitioning the
    // same way at topology-build time)
    require(branches.forall(_.keys == keys),
      s"cogrouped branches must share key columns: " +
        branches.map(_.keys.mkString("(", ",", ")")).mkString(" vs "))
    val u = branches.map(_.df)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

/** Windowed grouped stream (TimeWindowedKStream / SessionWindowedKStream). */
final case class WindowedG(df: DataFrame, keys: Seq[String], w: Column) {
  def count(): DataFrame =
    agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))

  def agg(aggs: Column*): DataFrame =
    df.groupBy(w.as("window") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .withColumn("w_end", col("window.end"))
      .drop("window")
}

/** KTable: latest-value-per-key changelog view. */
final case class KTableG(df: DataFrame, key: String) {
  def filter(cond: Column): KTableG = copy(df = df.filter(cond))

  def mapValues(cols: (String, Column)*): KTableG =
    copy(df = cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  /** KTable.groupBy(...).aggregate(...) — re-key the table and
    * aggregate. Kafka Streams implements this with add/subtract
    * callbacks replaying the changelog; on the compacted view the same
    * result is one declarative groupBy over CURRENT state — Spark
    * recomputes (or incrementally maintains, under streaming) the
    * aggregate from the latest rows, so no subtractor is needed. */
  def groupBy(cols: String*): KGroupedG = KGroupedG(df, cols, key)

  /** KTable⋈KTable (incl. FK joins: pass the FK column as `onLeft`). */
  def join(other: KTableG, onLeft: String, how: String = "inner"): KTableG =
    copy(df = df.join(other.df, df(onLeft) === other.df(other.key), how))

  def toStream: KStreamG = KStreamG(df, key, key)
  def toDF: DataFrame = df
}

/** GlobalKTable: broadcast-replicated dimension. */
final case class GlobalKTableG(df: DataFrame, key: String)
