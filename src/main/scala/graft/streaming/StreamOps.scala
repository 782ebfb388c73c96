package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** The Structured Streaming runtime: the Kafka-Streams-shaped pipelines
  * (KStream aggregation, KTable materialization, windowing, dedup,
  * sessionization) expressed as `readStream` → transform → `writeStream`.
  *
  * Source contract: `eventsStream` reads the fixture parquet as a file
  * stream — the sandbox has no broker, so the source is swappable: in
  * production replace with
  * `spark.readStream.format("kafka").option("subscribe", topic)` +
  * `from_json(value)`; every transform below is source-agnostic.
  *
  * Scale notes: stateful operators keep per-key state in the state store
  * (RocksDB provider on a real cluster); watermarks bound state size, so
  * every stateful pipeline here requires one. Shuffle partitioning of
  * the state is by the grouping key — the same partition-by-key model as
  * Kafka Streams tasks, minus the fixed topic-partition coupling.
  */
object StreamOps {

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class SessionOut(user_id: Long, s_start: Timestamp, s_end: Timestamp,
      n_events: Long)

  /** Any event time at/after this is a flush sentinel, not data (the
    * sentinels sit at 2100-01-01). */
  private val flushBound = to_timestamp(lit("2099-01-01 00:00:00"))

  /** The JSON serde half of the Kafka source: wire rows (binary `value`
    * as the connector emits them) → typed event columns. Factored out
    * of [[kafkaStream]] so it is testable WITHOUT a broker — the same
    * projection runs on any DataFrame with a binary `value` column
    * (KafkaSerdeSpec drives it on batch rows), leaving only the
    * connector `.format("kafka").load()` itself environment-blocked. */
  // µs-precision wire format for WRITERS: to_json's default pattern is
  // millisecond-only and silently truncates event times. The PARSER
  // below deliberately sets no timestampFormat — the default fallback
  // parser accepts fraction-less, milli, and micro variants alike
  // (a fixed pattern would null out producers that omit the fraction).
  private[graft] val kafkaTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private[graft] def parseKafkaValue(wire: DataFrame): DataFrame =
    wire
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")).as("e"))
      .select(col("e.*"))

  /** Production source: Kafka topic → typed event columns. Compiles
    * against the stable string-format API; requires the
    * spark-sql-kafka connector on the classpath at runtime (not shipped
    * in this sandbox — `eventsStream` below is the drop-in stand-in, and
    * every downstream transform is source-agnostic). */
  def kafkaStream(spark: SparkSession, bootstrapServers: String,
      topic: String): DataFrame =
    parseKafkaValue(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")
        .load())

  /** File-source stand-in for the Kafka source, with the same ns→µs
    * timestamp normalization as the batch path.
    *
    * `nanosAsLong` must stay set for the LIFETIME of any streaming query
    * built here — the parquet reader consults it at every micro-batch
    * (INT64 TIMESTAMP(NANOS) is otherwise an illegal type), not just at
    * schema-inference time — so it is deliberately not restored after
    * the build. It only affects nanos-annotated columns, which exist
    * solely in the events fixture. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file source needs a directory; scope it to the events file
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    normalizeTs(raw)
  }

  /** Land `ts` on TIMESTAMP (LTZ) whatever the fixture's physical type
    * is — delegates to [[graft.Tables.normalizeTs]], the single
    * implementation of the two-generation contract (incl. its UTC
    * session-timezone guard), so batch and stream reads can never
    * drift. */
  private def normalizeTs(df: DataFrame): DataFrame =
    graft.Tables.normalizeTs(df)

  /** The events file stream plus one far-future "__flush" row in a
    * second file. A finite stream's watermark only reaches
    * max(seen ts) − delay, so outer-join null padding and final window
    * emission for the tail of the data would stay locked in the state
    * store; the flush row advances the watermark past every real
    * window. It must pass through the `withWatermark` operator (which
    * tracks max event time) and be filtered AFTER it — which is how the
    * consumers below are structured. In production this is the role of
    * periodic broker heartbeats / idle-source timeouts. */
  // Flush-augmented source dirs are derived purely from the fixture
  // file, so they are shared across sessions; the cache records the
  // fixture's mtime and rebuilds if the file is regenerated in place.
  // Temp dirs are deleted on JVM exit (shutdown hook below).
  private val flushDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  private val tempDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  sys.addShutdownHook {
    import scala.jdk.CollectionConverters._
    tempDirs.asScala.foreach(d =>
      try deleteRecursively(java.nio.file.Paths.get(d))
      catch { case _: Throwable => () })
  }

  /** Create a tracked temp dir, cleaned up on JVM exit. Prefers a
    * tmpfs root (/dev/shm) when one exists: streaming checkpoints and
    * flush-file staging are pure scratch — per-micro-batch offset/
    * commit/state files whose fsyncs are deadweight on a disk-backed
    * /tmp. On a real cluster the checkpoint must instead be durable
    * shared storage (object store / DFS) for failure recovery; local
    * AvailableNow roundtrips have no recovery story to preserve. */
  private val tmpRoot: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm)) Some(shm) else None
  }

  private[graft] def newTempDir(prefix: String): java.nio.file.Path = {
    val dir = tmpRoot match {
      case Some(root) => java.nio.file.Files.createTempDirectory(root, prefix)
      case None       => java.nio.file.Files.createTempDirectory(prefix)
    }
    tempDirs.add(dir.toString)
    dir
  }

  def eventsStreamWithFlush(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val raw = spark.read.parquet(path)
    val dirStr = cachedScratchDir(flushDirs, sfDir, "events.parquet") {
      val dir = newTempDir("graft_stream_flush")
      // One flush row PER event type: Catalyst pushes deterministic
      // event_type predicates below the EventTimeWatermark operator, so a
      // single sentinel type would be filtered out before it could advance
      // the watermark. A per-type sentinel survives any type filter; the
      // consumer drops it with a ts-bound predicate, which references the
      // watermark column and therefore stays ABOVE the watermark operator
      // (see [[flushBound]]).
      val flush = raw.limit(1).drop("event_type")
        .crossJoin(raw.select(col("event_type")).distinct())
        .withColumn("event_id", lit(-1L))
        .withColumn("ts", raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            lit(4102444800000000000L)  // 2100-01-01 as ns
          case org.apache.spark.sql.types.TimestampNTZType =>
            lit(java.time.LocalDateTime.of(2100, 1, 1, 0, 0))
          case _ => to_timestamp(lit("2100-01-01 00:00:00"))
        })
        .select(raw.columns.map(col): _*)
      flush.coalesce(1).write.mode("overwrite").parquet(dir.toString)
      java.nio.file.Files.copy(java.nio.file.Paths.get(path),
        dir.resolve("events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dirStr)
    normalizeTs(stream)
  }

  /** Tumbling event-time window aggregation (KGroupedStream.windowedBy
    * + count/aggregate). */
  def tumblingAgg(events: DataFrame, size: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** KTable materialization: latest value per key as a changelog
    * aggregation (struct-max rides the whole row on a unique
    * (ts, event_id) ordering). */
  def latestByKey(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.ts").as("ts"), col("m.event_type").as("event_type"),
        round(col("m.value"), 2).as("value"))

  /** Exactly-once-per-key dedup with bounded state. */
  def dedupWithinWatermark(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Windowed stream-stream inner join (KStream⋈KStream with
    * JoinWindows): purchase within [view_ts, view_ts + Δ]. */
  def viewPurchaseJoin(events: DataFrame, joinWindow: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", joinWindow)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", joinWindow)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  /** Windowed stream-stream LEFT SEMI join — the streaming EXISTS:
    * each view emits ONCE if any purchase lands in its window, never
    * duplicated per match and never null-padded. Kafka Streams spells
    * this as join + distinct-by-left-key; Spark's native semi join
    * keeps only a match BIT per buffered left row, so state and output
    * are strictly smaller than the inner join's (s05). Matched rows
    * emit as soon as the match arrives — no watermark-close dependence
    * — while the watermark still bounds both sides' buffers. */
  def viewPurchaseSemiJoin(events: DataFrame, joinWindow: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", joinWindow)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", joinWindow)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"),
      "left_semi")
  }

  /** s27: the semi join driven as a true stream against the EXISTS
    * oracle. Semi-join rows emit when the match arrives, never at
    * watermark close, so the trailing no-data batch is pure state
    * cleanup — skip it. */
  def streamViewPurchaseSemi(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      viewPurchaseSemiJoin(eventsStream(spark, sfDir), "60 minutes"),
      "graft_s27", "append", noDataBatch = false)
      .orderBy(col("view_id"))

  /** Windowed stream-stream LEFT OUTER join (KStream.leftJoin with
    * JoinWindows): every view row is emitted — matched with each
    * purchase in [view_ts, view_ts + Δ], or null-padded once the
    * watermark passes the window close and the state store proves no
    * purchase can still arrive. The watermark is applied BEFORE the
    * event-type filters so a flush/heartbeat row can advance it (see
    * [[eventsStreamWithFlush]]). */
  def viewPurchaseLeftJoin(events: DataFrame, joinWindow: String,
      watermark: String): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    // drops flush sentinels AFTER they advance the watermark: this
    // conjunct references the event-time column, so predicate pushdown
    // cannot move it below the EventTimeWatermark operator (the
    // event_type conjunct CAN be pushed to the scan — harmless, since
    // sentinels exist per type)
    val realRows = col("ts") < flushBound
    val views = wm.filter(col("event_type") === "view" && realRows)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = wm.filter(col("event_type") === "purchase" && realRows)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"),
      "left_outer")
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  /** Windowed stream-stream FULL OUTER join (KStream.outerJoin with
    * JoinWindows): every view AND every purchase row is emitted —
    * matched pairs as they arrive, unmatched rows null-padded once the
    * watermark proves no partner can still arrive. Same flush-sentinel
    * machinery as the left join; state on BOTH sides is evicted by the
    * watermark, so state size is bounded by rows within the join window
    * regardless of stream length. */
  def viewPurchaseOuterJoin(events: DataFrame, joinWindow: String,
      watermark: String): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    val realRows = col("ts") < flushBound
    val views = wm.filter(col("event_type") === "view" && realRows)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = wm.filter(col("event_type") === "purchase" && realRows)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"),
      "full_outer")
      .select(col("view_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user")).as("user_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  /** KTable ⋈ KTable FK join with changelog semantics (see
    * [[FkJoinProcessor]]): both changelog streams merge into one stream
    * keyed by the foreign key — left rows by their fk column, right rows
    * by their primary key — and the per-fk state fans updated right
    * values out to every referencing left row. Works for batch or
    * streaming inputs of either side. */
  def tableTableFkJoin(left: DataFrame, leftKey: String, leftFk: String,
      leftVal: String, right: DataFrame, rightKey: String,
      rightVal: String): Dataset[FkJoined] = {
    import left.sparkSession.implicits._
    // null keys can't join (Kafka Streams drops null-FK records — no
    // subscription is possible) and would fail FkEvent's primitive-Long
    // encoder: filter them out on both sides
    val l = left.filter(col(leftFk).isNotNull)
      .select(col(leftFk).cast("long").as("fk"),
      lit("L").as("side"), col(leftKey).cast("long").as("left_key"),
      col(leftVal).cast("string").as("left_val"),
      lit(null).cast("string").as("right_val")).as[FkEvent]
    val r = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).cast("long").as("fk"),
      lit("R").as("side"), lit(-1L).as("left_key"),
      lit(null).cast("string").as("left_val"),
      col(rightVal).cast("string").as("right_val")).as[FkEvent]
    l.unionByName(r)
      .groupByKey(_.fk)
      .transformWithState(new FkJoinProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[FkJoined])
  }

  /** Arbitrary stateful processing (Processor-API analogue):
    * sessionization via flatMapGroupsWithState with event-time timeout.
    * Sessions close when the watermark passes last_ts + gap. */
  def sessionize(events: Dataset[EventRow], gapMs: Long,
      watermark: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L

    // java.sql.Timestamp keeps microseconds in the nanos field;
    // session bounds must stay µs-exact to match batch session_window
    def toMicros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    def fn(userId: Long, rows: Iterator[EventRow],
        state: GroupState[List[(Long, Long, Long)]]): Iterator[SessionOut] = {
      // state: open sessions as (startUs, lastUs, count)
      val sorted = rows.map(r => toMicros(r.ts)).toSeq.sorted
      var sessions = state.getOption.getOrElse(Nil)
      for (t <- sorted) {
        sessions = sessions match {
          case (s, e, n) :: rest if t - e < gapUs => (s, math.max(e, t), n + 1) :: rest
          case _ => (t, t, 1L) :: sessions
        }
      }
      if (state.hasTimedOut || sorted.nonEmpty) {
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val (closed, open) = sessions.partition { case (_, e, _) => e + gapUs <= wmUs }
        state.update(open)
        if (open.isEmpty && state.exists) state.remove()
        else if (open.nonEmpty)
          // arm on the EARLIEST open session's close boundary: with the
          // max, one far-future session (e.g. a key that also received a
          // flush sentinel) would postpone the timer past every earlier
          // session's close and they would never emit; with the min, the
          // timeout fires at each next close, emits, and re-arms here
          // for the remaining open sessions. Always > current watermark:
          // open sessions satisfy e + gap > wm by the partition above.
          state.setTimeoutTimestamp(open.map(_._2).min / 1000L + gapMs + 1)
        closed.sortBy(_._1).iterator.map { case (s, e, n) =>
          SessionOut(userId, fromMicros(s), fromMicros(e + gapUs), n)
        }
      } else Iterator.empty
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Terminal progress of the most recent [[runToMemory]] run, by query
    * name — the observability seam for state-size assertions: the spec
    * suite reads `stateOperators.numRowsTotal` here to prove each
    * transformWithState query's RocksDB row count is bounded by its
    * declared contract (occupied buckets / one record per user /
    * touched terms), not by event volume. */
  private[graft] val lastProgressByName = scala.collection.concurrent
    .TrieMap.empty[String, org.apache.spark.sql.streaming.StreamingQueryProgress]

  /** Drive a streaming DataFrame to completion against a memory sink and
    * return the materialized result (available-now semantics).
    *
    * Streaming shuffles are exempt from AQE partition coalescing, so a
    * high session `shuffle.partitions` (tuned for batch) means that many
    * state-store instances per micro-batch — pure overhead at local
    * fixture scale. Cap the stateful parallelism for the streaming query
    * and restore the session value afterwards (the knob a Kafka Streams
    * app would call num.stream.threads). */
  def runToMemory(df: DataFrame, name: String, mode: String,
      partitions: Option[Int] = None,
      noDataBatch: Boolean = true,
      assertLastBatchId: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    val prevNd = spark.conf.get(ndKey)
    spark.catalog.dropTempView(name)
    // Streaming shuffle parallelism = state-store instances per batch.
    // Most fixture queries keep tiny per-batch state (≤150 keys), so 2
    // stores saturate a local run; queries that push the full event
    // volume THROUGH the store per batch (the transformWithState
    // changelogs) pass a higher `partitions` — the same sizing call a
    // Kafka Streams deployment makes with num.stream.threads: match
    // store parallelism to per-batch state traffic, not to key count.
    val cap = partitions.getOrElse(
      Integer.getInteger("graft.stream.partitions", 2).intValue())
    spark.conf.set(key,
      math.min(cap, spark.sparkContext.defaultParallelism).toString)
    // Complete mode re-emits the whole result every batch and never
    // waits on a watermark close, so the trailing no-data batch is one
    // pure-overhead state-store round trip; append/update queries NEED
    // it (final windows / outer-join padding emit there) — EXCEPT the
    // TimeMode.None transformWithState pipelines, which have no
    // watermark and no timers to fire, so their callers pass
    // noDataBatch = false and skip the same overhead.
    if (mode == "complete" || !noDataBatch) spark.conf.set(ndKey, "false")
    try {
      // AvailableNow: process everything (including the watermark-close
      // no-data batch that emits final windows / outer-join padding) and
      // terminate — one less idle-detection round trip than
      // processAllAvailable + stop
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation",
          newTempDir(s"graft_ckpt_$name").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Option(q.lastProgress).foreach(lastProgressByName.put(name, _))
      // Callers whose ORACLE encodes the micro-batch schedule (s38: the
      // two-watermark late filter lags exactly one batch per file
      // trigger) pin the terminal batchId here, so a Spark upgrade that
      // changes AvailableNow scheduling (an interleaved no-data batch,
      // a merged trigger) fails loudly instead of silently producing a
      // one-batch-off oracle divergence.
      assertLastBatchId.foreach { expect =>
        val got = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        require(got == expect,
          s"$name: terminal batchId $got != expected $expect — " +
            "micro-batch scheduling changed; revisit the oracle's " +
            "batch-lag assumptions")
      }
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(ndKey, prevNd)
    }
    spark.table(name)
  }

  // ---- oracle-checked streaming roundtrips -------------------------------

  /** Streaming tumbling daily aggregation, Complete mode (all windows
    * emitted at end-of-stream) — must equal the batch/DuckDB answer. */
  def streamTumbling(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      tumblingAgg(eventsStream(spark, sfDir), "1 day", "10 minutes"),
      "graft_s01", "complete")
      .orderBy(col("w_start"), col("event_type"))

  private val sinkDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s33: the SINK half of the `to(topic)` contract under the oracle
    * gate — the s01 tumbling aggregation written through a REAL
    * `writeStream.format("parquet")` file sink in append mode (final
    * windows emit at watermark close via the flush sentinel, the only
    * mode file sinks support), then read back from the sink's own
    * output files. Round-tripping through the sink proves the emitted
    * files — schema, values, window closure — not just the in-memory
    * result: a dropped final window, a re-emitted update, or a schema
    * drift in the sink path all change the hash.
    *
    * On a cluster the sink directory is the object-store landing zone
    * and AvailableNow is the backfill trigger; exactly-once comes from
    * the sink's transaction log (_spark_metadata), which this read-back
    * honors. Cached per (sfDir, fixture mtime) like every derived
    * scratch dir. */
  def streamSinkRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Det.dsum
    val dirStr = cachedScratchDir(sinkDirs, sfDir, "events.parquet") {
        val out = newTempDir("graft_s33_sink")
        val ev = eventsStreamWithFlush(spark, sfDir)
          .withWatermark("ts", "10 minutes")
          .filter(col("ts") < flushBound)
        val agg = ev
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("w.start").as("w_start"), col("event_type"),
            col("n"), col("sum_value"))
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try {
          withRocksDb(spark) {
            agg.writeStream
              .format("parquet")
              .option("path", out.toString)
              .option("checkpointLocation",
                newTempDir("graft_ckpt_s33").toString)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
              .awaitTermination()
          }
        } finally spark.conf.set(key, prev)
        out.toString
    }
    spark.read.parquet(dirStr)
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Streaming KTable materialization, Complete mode. */
  def streamLatest(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(latestByKey(eventsStream(spark, sfDir)),
      "graft_s02", "complete")
      .orderBy(col("user_id"))

  /** Streaming hopping-window aggregation (1 h size / 30 min slide),
    * Complete mode — equals the batch hopping query e03. */
  def streamHopping(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      eventsStream(spark, sfDir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n")),
      "graft_s04", "complete")
      .orderBy(col("w_start"), col("event_type"))

  /** Streaming windowed stream-stream join (append mode; inner joins
    * emit matches as they arrive) — equals the batch interval join e06. */
  def streamViewPurchase(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      viewPurchaseJoin(eventsStream(spark, sfDir), "60 minutes"),
      // inner joins emit matches as they arrive; no watermark-close
      // output → the trailing no-data batch is skippable overhead
      "graft_s05", "append", noDataBatch = false)
      .orderBy(col("view_id"), col("purchase_id"))

  /** Streaming dedup by event_id (all fixture ids are unique → output
    * equals input projection, proving pass-through + state plumbing). */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      dedupWithinWatermark(eventsStream(spark, sfDir), "10 minutes")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
      // dedup emits first-seen rows immediately; the no-data batch only
      // evicts expired suppression state → skippable
      "graft_s03", "append", noDataBatch = false)
      .orderBy(col("event_id"))

  /** The FK-join processor driven in BATCH mode (transformWithState
    * executes on batch Datasets too — one group invocation per key):
    * customer ⋈ nation through the changelog state machine must equal
    * the plain SQL join, proving the processor's join algebra against
    * the DuckDB oracle while the streaming spec proves its update
    * fan-out. */
  def fkJoinBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    tableTableFkJoin(
      graft.Tables.customer(spark, sfDir), "c_custkey", "c_nationkey", "c_name",
      graft.Tables.nation(spark, sfDir).withColumn("n_nationkey",
        col("n_nationkey").cast("long")), "n_nationkey", "n_name")
      .toDF()
      .orderBy(col("left_key"))
  }

  /** Streaming windowed LEFT OUTER join (append mode; null-padded rows
    * emitted on watermark close) — equals the batch LEFT JOIN interval
    * query. Ordered with nulls first to match the oracle's NULLS FIRST. */
  def streamViewPurchaseLeft(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      viewPurchaseLeftJoin(eventsStreamWithFlush(spark, sfDir),
        "60 minutes", "10 minutes"),
      "graft_s06", "append")
      .orderBy(col("view_id").asc, col("purchase_id").asc_nulls_first)

  /** Streaming windowed FULL OUTER join (append mode; unmatched rows on
    * EITHER side null-padded on watermark close) — equals the batch
    * FULL JOIN interval query. */
  def streamViewPurchaseOuter(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      viewPurchaseOuterJoin(eventsStreamWithFlush(spark, sfDir),
        "60 minutes", "10 minutes"),
      "graft_s13", "append")
      .orderBy(col("view_id").asc_nulls_first, col("purchase_id").asc_nulls_first)

  /** Streaming stream-static broadcast join (KStream ⋈ GlobalKTable —
    * the dimension-enrichment staple): the events stream looks up a
    * fully-replicated nation-like dim by a key mapper (user_id mod 25),
    * exactly Kafka Streams' `join(GlobalKTable, keyMapper, joiner)`.
    * The dim is broadcast — each micro-batch is a BroadcastHashJoin
    * with NO shuffle and no state store; at 1000 executors the dim
    * ships once per executor, the stream never moves. Inner
    * stream-static joins need no watermark. */
  def streamDimEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = graft.Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
    runToMemory(
      eventsStream(spark, sfDir)
        .withColumn("nk", col("user_id") % 25)
        .join(broadcast(dim), "nk")
        .select(col("event_id"), col("user_id"), col("n_name"),
          round(col("value"), 2).as("value")),
      "graft_s08", "append")
      .orderBy(col("event_id"))
  }

  /** Streaming RANGE enrich (stream-side of e21's binned interval
    * join): each event picks up the deterministic promo interval(s)
    * containing its timestamp. The join is an EQUI-join on the day
    * bucket with the exact range check as a residual filter — the same
    * bucketing that makes the batch big-big range join shuffle-safe;
    * under streaming it additionally means NO state store and no
    * watermark (plain inner stream-static join), because the bucket
    * key is derived from the event row itself. The 10-row interval
    * side is broadcast; a large interval table would hash-partition by
    * bucket and co-locate with the stream's shuffle. */
  def streamRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val promoDays = graft.operators.Events.promoIntervals(spark)
      .select(col("promo_id"), col("p_start"), col("p_end"),
        explode(expr(
          "sequence(date_trunc('DAY', p_start), date_trunc('DAY', p_end), interval 1 day)"))
          .as("bucket"))
    runToMemory(
      eventsStream(spark, sfDir)
        .withColumn("bucket", date_trunc("DAY", col("ts")))
        .join(broadcast(promoDays), "bucket")
        .filter(col("ts") >= col("p_start") && col("ts") < col("p_end"))
        .select(col("event_id"), col("promo_id"), col("user_id"),
          round(col("value"), 2).as("value")),
      "graft_s16", "append")
      .orderBy(col("event_id"), col("promo_id"))
  }

  /** Streaming session-window aggregation in APPEND mode (the
    * SessionWindows.ofInactivityGap + suppress-until-close pairing):
    * sessions emit only when the watermark proves the gap can no longer
    * be extended. The flush sentinel advances the watermark past every
    * real session's close; sentinel rows are dropped AFTER the watermark
    * operator (ts-bound predicate) so they never pollute a session, and
    * the sentinels' own far-future sessions never close, so they never
    * emit. Must equal the batch session_window query (e04 oracle). */
  def streamSessionWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Det.dsum
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
    runToMemory(
      ev.groupBy(session_window(col("ts"), "2 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events"), col("sum_value")),
      "graft_s09", "append")
      .orderBy(col("user_id"), col("s_start"))
  }

  /** s28: streaming DYNAMIC-GAP sessions — e33's per-event idle horizon
    * (error 5 min / purchase 30 min / else 2 h) under append-mode
    * Structured Streaming, same flush-sentinel watermark close as s09.
    * Verifies that gap-expression session merging behaves identically
    * when sessions are assembled incrementally in the state store. */
  def streamDynamicSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Det.dsum
    val gap = when(col("event_type") === "error", "5 minutes")
      .when(col("event_type") === "purchase", "30 minutes")
      .otherwise("2 hours")
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
    runToMemory(
      ev.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events"), col("sum_value")),
      "graft_s28", "append")
      .orderBy(col("user_id"), col("s_start"))
  }

  /** s32: sessionization by EVENT-TIME TIMERS — the third face of the
    * e04 session contract (s09 = engine `session_window`, s22 =
    * hand-rolled FMGWS, s32 = Processor-API timers à la Kafka Streams
    * `punctuate(STREAM_TIME)`): open sessions live in
    * [[TimerSessionProcessor]] state, and a registered event-time timer
    * closes each one exactly when the watermark passes its extension
    * horizon. All three must equal the e04 batch oracle — this declares
    * the timer mechanism itself (previously spec-only in TimerTtlSpec)
    * under the hash-compared correctness gate.
    *
    * The flush sentinel advances the watermark past every real
    * session's close (s09's discipline); sentinel rows are filtered
    * after the watermark operator and never enter state. */
  def streamTimerSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 2L * 3600L * 1000000L
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          * 10000).cast("long").as("v4"))
      .as[SessIn]
    val stream = ev.groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[SessOut])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s32", "update", Some(8))
    }
      .select($"user_id",
        timestamp_micros($"start_us").as("s_start"),
        timestamp_micros($"end_us" + gapUs).as("s_end"),
        $"n_events",
        round($"sum4" / 10000.0, 2).as("sum_value"))
      .orderBy($"user_id", $"s_start")
  }

  // s10/s15 changelog dirs: derived from the fixture tables; cached per
  // (sfDir, fixture mtime) like flushDirs, cleaned on JVM exit
  private val fkStreamDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]
  private val tableUpdateDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]
  private val topNDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]
  private val boundedTriggerDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** Materialize `batches` as ONE parquet file each, mtime-ordered, so a
    * file-source stream with maxFilesPerTrigger=1 replays them as that
    * exact micro-batch sequence — the harness's stand-in for ordered
    * Kafka topic offsets. Cached per (sfDir, fixture mtime). */
  /** Cache a derived scratch dir per (sfDir, source-fixture mtime) —
    * THE idiom for every fixture-derived scratch location (flush dirs,
    * changelog dirs, sink output): rebuild iff the driver regenerated
    * the fixture in place. NOTE: `updateWith`'s remapping function may
    * in principle re-run under contention; the driver surfaces invoke
    * queries single-threaded, and a re-run would only build a duplicate
    * scratch dir (both tracked for exit cleanup), never corrupt one. */
  private[graft] def cachedScratchDir(cache:
      scala.collection.concurrent.TrieMap[String, (Long, String)],
      sfDir: String, srcFixture: String)(build: => String): String = {
    val srcMtime = new java.io.File(s"$sfDir/$srcFixture").lastModified()
    cache.get(sfDir).filter(_._1 == srcMtime).map(_._2).getOrElse(
      cache.updateWith(sfDir) { _ => Some((srcMtime, build)) }.get._2)
  }

  /** Set `spark.sql.shuffle.partitions` for the duration of `body` and
    * restore the session value after — the save/set/try/finally block
    * every streaming roundtrip needs (state-store instances per batch =
    * shuffle partitions; see [[runToMemory]]'s sizing note). */
  private[graft] def withShufflePartitions[A](spark: SparkSession,
      n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Write `df` as exactly ONE uncompressed parquet FILE at `dst` (not
    * a directory): coalesce(1) into a scratch dir, move the single part
    * file out, drop the scaffolding. File-source streams glob concrete
    * file names, so sinks/batches must land as plain files. */
  private[graft] def writeSingleFile(df: DataFrame,
      dst: java.nio.file.Path): Unit = {
    val tmp = dst.getParent.resolve(s".${dst.getFileName}.build")
    df.coalesce(1).write.option("compression", "none")
      .mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val f = try {
      val it = listing.iterator()
      Iterator.continually(it).takeWhile(_.hasNext)
        .map(_.next()).find(_.toString.endsWith(".parquet")).get
    } finally listing.close()
    java.nio.file.Files.deleteIfExists(dst)
    java.nio.file.Files.move(f, dst)
    deleteRecursively(tmp)
  }

  /** Materialize ONE batch DataFrame as `changelog_<i>.parquet` in
    * `dir`, mtime-pinned so a file-source stream replays files in index
    * order. Shared by [[orderedBatchDir]] (all batches up front) and
    * the restart harness (s40 adds files BETWEEN query runs). */
  private[graft] def writeChangelogFile(df: DataFrame,
      dir: java.nio.file.Path, i: Int): Unit = {
    val dst = dir.resolve(s"changelog_$i.parquet")
    writeSingleFile(df, dst)
    dst.toFile.setLastModified(1700000000000L + i * 60000L)
  }

  private[graft] def orderedBatchDir(cache:
      scala.collection.concurrent.TrieMap[String, (Long, String)],
      sfDir: String, srcFixture: String, prefix: String)(
      batches: => Seq[DataFrame]): String =
    cachedScratchDir(cache, sfDir, srcFixture) {
          val dir = newTempDir(prefix)
          // each batch is its own Spark job — run them concurrently
          // (the scheduler interleaves them across the idle cores) and
          // skip compression: this is throwaway scratch on tmpfs, the
          // snappy encode of a full event batch is pure timed overhead
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.{Await, Future}
          val writes = batches.zipWithIndex.map { case (df, i) => Future {
            writeChangelogFile(df, dir, i)
          }}
          writes.foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
          dir.toString
    }

  /** transformWithState requires the RocksDB state store provider; set it
    * for the duration of `body` and restore the session values after.
    * Changelog checkpointing goes with it: per commit, upload only the
    * batch's changelog instead of a full RocksDB snapshot — the
    * documented production setting for frequent-commit workloads, and
    * measured ~5% off the s-series fixed overhead here (snapshots still
    * happen, just in the background maintenance pass). */
  private[graft] def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val ck = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(pk)
    val prevCk = spark.conf.getOption(ck)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(ck, "true")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(pk, v)
        case None => spark.conf.unset(pk)
      }
      prevCk match {
        case Some(v) => spark.conf.set(ck, v)
        case None => spark.conf.unset(ck)
      }
    }
  }

  /** The FK changelog join driven as a TRUE STREAM in three ordered
    * micro-batches (file source, maxFilesPerTrigger=1, files ordered by
    * mtime):
    *   batch 0 — right v1: every nation keyed by its pk, name "OLD_"+n;
    *   batch 1 — left: every customer keyed by its fk (c_nationkey);
    *   batch 2 — right v2: every nation again with the final name.
    * Batch 1 exercises the lookup path (left upsert joins stored right
    * value); batch 2 exercises the CHANGELOG FAN-OUT (a right update
    * re-emits every referencing left row). The declared result is the
    * full ordered changelog — two rows per customer, one per right
    * version — which a plain SQL join × {v1,v2} reproduces, so the
    * fan-out itself is what the oracle verifies: miss it and the v2
    * rows are absent. */
  def streamFkChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(fkStreamDirs, sfDir, "customer.parquet",
        "graft_fk_stream") {
      val nation = graft.Tables.nation(spark, sfDir)
      val customer = graft.Tables.customer(spark, sfDir)
      def rightVer(nameExpr: org.apache.spark.sql.Column) = nation.select(
        col("n_nationkey").cast("long").as("fk"), lit("R").as("side"),
        lit(-1L).as("left_key"), lit(null).cast("string").as("left_val"),
        nameExpr.as("right_val"))
      val lefts = customer.select(
        col("c_nationkey").cast("long").as("fk"), lit("L").as("side"),
        col("c_custkey").cast("long").as("left_key"),
        col("c_name").cast("string").as("left_val"),
        lit(null).cast("string").as("right_val"))
      Seq(rightVer(concat(lit("OLD_"), col("n_name"))), lefts,
          rightVer(col("n_name")))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "fk BIGINT, side STRING, left_key BIGINT, left_val STRING, right_val STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[FkEvent]
      .groupByKey(_.fk)
      .transformWithState(new FkJoinProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[FkJoined])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s10", "update", Some(8),
        noDataBatch = false)
        .orderBy(col("left_key"), col("right_val"))
    }
  }

  /** Stream ⋈ UPDATING KTable driven as a true stream in four
    * mtime-ordered micro-batches (see [[StreamTableJoinProcessor]]):
    *   batch 0 — table v1: the 25-row dim keyed 0..24, name "OLD_"+n;
    *   batch 1 — stream: every even-event_id event (key user_id mod 25);
    *   batch 2 — table v2: the dim again with the final name;
    *   batch 3 — stream: every odd-event_id event.
    * Batch-1 records join v1, batch-3 records join v2 — the oracle's
    * CASE on event_id parity reproduces exactly that, so what the hash
    * verifies is the UPDATE VISIBILITY itself: a processor that served
    * stale (or fanned-out) values would put the wrong dim_name on half
    * the rows. Complements s14, which pins the snapshot-join algebra. */
  def streamTableUpdateJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(tableUpdateDirs, sfDir, "events.parquet",
        "graft_st_update") {
      val nation = graft.Tables.nation(spark, sfDir)
      val ev = graft.Tables.events(spark, sfDir).select(
        (col("user_id") % 25).as("nk"), lit("S").as("side"),
        col("event_id"), col("user_id"), col("event_type"),
        lit(null).cast("string").as("dim_name"))
      def tableVer(nameExpr: org.apache.spark.sql.Column) = nation.select(
        col("n_nationkey").cast("long").as("nk"), lit("T").as("side"),
        lit(-1L).as("event_id"), lit(-1L).as("user_id"),
        lit(null).cast("string").as("event_type"), nameExpr.as("dim_name"))
      Seq(tableVer(concat(lit("OLD_"), col("n_name"))),
          ev.filter(col("event_id") % 2 === 0),
          tableVer(col("n_name")),
          ev.filter(col("event_id") % 2 =!= 0))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "nk BIGINT, side STRING, event_id BIGINT, user_id BIGINT, " +
        "event_type STRING, dim_name STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[StEvent]
      .groupByKey(_.nk)
      .transformWithState(new StreamTableJoinProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[StJoined])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s15", "update", Some(8),
        noDataBatch = false)
        .orderBy(col("event_id"))
    }
  }

  /** Streaming KStream ⋈ KTable (stream joins the compacted changelog):
    * every event is enriched with its user's LATEST state — the
    * row_number-compacted materialization of the same events topic,
    * exactly Kafka Streams' `stream.join(table)` against the table's
    * current snapshot. The table side is NOT broadcast: KStream⋈KTable
    * is a co-partitioned shuffle join in Kafka Streams (table state can
    * be as large as the keyspace), and the Spark plan mirrors that — at
    * 1000 executors both sides hash-partition by user_id and the
    * per-micro-batch join is local. The continuously-UPDATING table
    * variant is exercised in StreamTableJoinSpec; this declared query
    * pins the snapshot-join algebra to the oracle. */
  def streamTableJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // Spark re-evaluates the STATIC side of a stream-static join on every
    // micro-batch; without a materialization point the row_number
    // compaction (full shuffle + window over the events table) re-runs
    // per trigger. localCheckpoint pins the compacted snapshot once —
    // which is also the semantic contract here: the table is a SNAPSHOT,
    // not a live view (the updating variant is s15 / StreamTableJoinSpec).
    val table = latestByKey(graft.Tables.events(spark, sfDir))
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
      .localCheckpoint()
    runToMemory(
      eventsStream(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .join(table, "user_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("last_type"), col("last_value")),
      "graft_s14", "append")
      .orderBy(col("event_id"))
  }

  /** Streaming grouped top-N (the per-key leaderboard, see
    * [[TopNProcessor]]): events arrive in three mtime-ordered
    * micro-batches (split by event_id mod 3 — every batch touches every
    * key, so the cross-batch state merge is what's exercised), each
    * batch folds into the bounded per-key buffer, and the emitted
    * changelog is compacted to each key's final version. The oracle's
    * batch ranking must equal that final buffer exactly — a processor
    * that dropped state between batches, or merged order-sensitively,
    * produces different rows. */
  def streamTopN(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(topNDirs, sfDir, "events.parquet",
        "graft_topn") {
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"), col("value"))
      (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_type STRING, event_id BIGINT, value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[TopNEvent]
      .groupByKey(_.event_type)
      .transformWithState(new TopNProcessor(5),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[TopNRow])
      .toDF()
    val all = withRocksDb(spark) {
      runToMemory(stream, "graft_s18", "update", Some(8),
        noDataBatch = false)
    }
    // compact the emitted changelog to each key's latest version (the
    // result table is ≤ keys × N × batches rows — trivially small)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    all.withColumn("maxver", max(col("ver")).over(w))
      .filter(col("ver") === col("maxver"))
      .select(col("event_type"), col("rank"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** Streaming EXACT distinct-user counts per tumbling day via CHAINED
    * STATEFUL AGGREGATIONS (Spark 3.4+ multiple-stateful-operator
    * support): stage 1 collapses (window, user) — the map-side combine
    * of a distinct — stage 2 counts the survivors per window. Both
    * stages are state stores in ONE streaming query; windows emit in
    * append mode when the watermark (advanced by the flush sentinel)
    * closes them. Kafka Streams needs a custom per-window set store for
    * this; here it is two declarative groupBys. At 100 TB the stage-1
    * state is bounded by live (window, user) pairs and the stage-2
    * shuffle carries only one row per pair — the same two-phase shape
    * an exact COUNT(DISTINCT) batch plan uses. */
  def streamDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
    val perUser = ev
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val perWindow = perUser
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
      .select(col("w.start").as("w_start"), col("n_users"), col("n_events"))
    runToMemory(perWindow, "graft_s11", "append")
      .orderBy(col("w_start"))
  }

  /** s45: streaming trailing-7-day sliding distinct users (e51's
    * streaming face) — s11's chained-stateful exact distinct over
    * SLIDING windows: `window(ts, '7 days', '1 day')` fans each event
    * into its ≤ 7 window instances map-side, stage 1 collapses
    * (window, user), stage 2 counts survivors per window; windows emit
    * in append mode as the watermark (advanced by the flush sentinel)
    * closes them. The day label is the window's last covered day
    * (end − 1 day). Kafka Streams' hopping-window distinct needs a
    * per-window set store; here it is the same two declarative
    * groupBys as s11 with a slide.
    *
    * The window stream necessarily emits every instance CONTAINING an
    * event (a window whose own label day is quiet still counts
    * trailing actives); e51's contract reports only days WITH
    * activity, so the declared result applies that restriction after
    * the stream terminates — a ≤|calendar|-row batch semi join, the
    * s18 post-compaction precedent.
    *
    * At 100 TB: stage-1 state is live (window, user) pairs — the ×7
    * slide multiplies state, which is exactly the sliding-distinct
    * cost a per-window set store pays in any engine; the watermark
    * retires 1/7th of it per day. Stage 2 sees one row per pair. */
  def streamSlidingMau(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
    val perUser = ev
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val perWindow = perUser
      .groupBy(col("w"))
      .agg(count(lit(1)).as("mau7"))
      .select(date_sub(col("w.end").cast("date"), 1).as("day"),
        col("mau7"))
    val activeDays = graft.Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    runToMemory(perWindow, "graft_s45", "append")
      .join(broadcast(activeDays), Seq("day"), "left_semi")
      .orderBy(col("day"))
  }

  /** Hot-key streaming aggregation via SALTING (the streaming face of
    * e22's SkewJoin): `event_type` has only 5 values, so a single-stage
    * streaming groupBy puts 20% of the stream through one state-store
    * instance — the classic streaming straggler. Stage 1 aggregates by
    * (event_type, salt) with a deterministic 8-way salt (hash of
    * event_id), spreading each hot key over 8 stores; stage 2
    * re-combines the 5×8 partials per key. Chained stateful
    * aggregations keep both stages in ONE streaming query; stage-2
    * state is bounded by live (window, key, salt) triples. Both stages
    * run on the s11 skeleton — watermarked day windows, flush-sentinel
    * close, append mode (chained stateful aggregations require the
    * window+watermark form; an unwindowed chain trips Spark's
    * global-watermark correctness check). Decimal partial sums re-sum
    * exactly, so the result equals the unsalted daily aggregation —
    * which is what the oracle checks. */
  def streamSaltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
    val stage1 = ev
      .withColumn("salt", pmod(hash(col("event_id")), lit(8)))
      .groupBy(window(col("ts"), "1 day").as("w"),
        col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,4)")).as("psum"))
    val stage2 = stage1
      .groupBy(col("w"), col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("psum")).cast("double"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    runToMemory(stage2, "graft_s17", "append")
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Streaming POISON-PILL quarantine (the serde-robustness half of the
    * Kafka source, run as a stream): the deliberately dirty JSON copy
    * of events (see [[graft.sources.FileSources]] e26 — every 97th
    * event_id is a malformed line) is consumed as a TEXT stream and
    * parsed with `from_json`, which yields a null struct for corrupt
    * lines instead of killing the query — a single bad producer must
    * never stall the consumer group. Complete-mode counts per bucket
    * must equal e26's batch arithmetic over the clean table. At scale
    * the `_corrupt` bucket is the dead-letter topic's input. */
  def streamCorruptQuarantine(spark: SparkSession, sfDir: String): DataFrame = {
    val dirStr = graft.sources.FileSources.dirtyJsonDir(spark, sfDir)
    val parsed = spark.readStream
      .text(dirStr)
      .select(col("value"), from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING"),
        java.util.Map.of("timestampFormat",
          graft.sources.FileSources.TsFmt)).as("e"))
      .select(
        coalesce(col("e.event_type"), lit("_corrupt")).as("bucket"),
        when(col("e.event_id").isNull, 1L).otherwise(0L).as("corrupt"),
        coalesce(col("e.value"), lit(0.0)).as("value"))
    runToMemory(
      parsed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("corrupt")).as("n_corrupt"),
          graft.functions.Det.dsum(col("value")).as("sum_value")),
      "graft_s19", "complete")
      .orderBy(col("bucket"))
  }

  /** Streaming MERGE of two independent sources (KStream#merge with
    * real heterogeneity): the parquet file stream and the dirty
    * JSON-lines text stream run as two sources inside ONE streaming
    * query, unioned record-wise before a shared aggregation — the
    * fan-in topology of consuming two topics with different serdes.
    * The JSON side contributes only its parseable rows (s19's
    * quarantine drops the rest), so the per-type counts are exactly
    * batch + batch-minus-corrupt, which is what the oracle checks. */
  def streamMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val a = eventsStream(spark, sfDir)
      .select(col("event_type"), col("value"))
    val b = spark.readStream
      .text(graft.sources.FileSources.dirtyJsonDir(spark, sfDir))
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING"),
        java.util.Map.of("timestampFormat",
          graft.sources.FileSources.TsFmt)).as("e"))
      .filter(col("e.event_id").isNotNull)
      .select(col("e.event_type").as("event_type"), col("e.value").as("value"))
    runToMemory(
      a.unionByName(b).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Det.dsum(col("value")).as("sum_value")),
      "graft_s20", "complete")
      .orderBy(col("event_type"))
  }

  /** Streaming `cogroup` THROUGH THE DSL (the same CogroupedG that
    * runs e19 in batch): three event-type branches of the stream fold
    * into one aggregation — a null-padding union feeding a single
    * stateful groupBy, so all branches share ONE state store and one
    * shuffle, exactly the shared-store update loop a Kafka Streams
    * cogroup maintains. Complete mode emits the final per-user row;
    * must equal the e19 batch oracle. */
  def streamCogroup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.api.GraftStreams
    import graft.functions.Det.dsum
    val ev = eventsStream(spark, sfDir)
    def branch(tpe: String, cols: (String, org.apache.spark.sql.Column)*) =
      GraftStreams.stream(
        ev.filter(col("event_type") === tpe)
          .select(col("user_id") +: cols.map { case (n, c) => c.as(n) }: _*),
        "user_id", cols.head._1).groupByKey
    runToMemory(
      branch("view", "v_ts" -> col("ts"))
        .cogroup(branch("click", "c_ts" -> col("ts")))
        .cogroup(branch("purchase", "p_ts" -> col("ts"),
          "p_value" -> col("value")))
        .aggregate(
          count(col("v_ts")).as("n_views"),
          count(col("c_ts")).as("n_clicks"),
          count(col("p_ts")).as("n_purchases"),
          dsum(col("p_value")).as("purchase_value")),
      "graft_s12", "complete")
      .orderBy(col("user_id"))
  }

  /** s21: the composed end-to-end ingest topology in ONE streaming
    * query — type filter → windowed dedup → broadcast dim-enrich →
    * tumbling daily aggregation per dimension value. This is the full
    * Kafka Streams consumer-chain shape (filter → transform →
    * join(GlobalKTable) → windowedBy → aggregate) running as TWO
    * chained stateful operators (the dedup store feeding the window
    * store — Spark 3.4+ multi-stateful append mode) with a stateless
    * broadcast join between them.
    *
    * Scale: the dedup state is keyed by event_id and bounded by the
    * watermark; the dim is broadcast so the stream shuffles ONCE (for
    * dedup) and the window agg reuses nothing wider than the
    * dedup-partitioned stream; at 1000 executors each operator scales
    * by its own key space exactly like the standalone s03/s08/s01. */
  def streamPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = graft.Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
    val ev = eventsStreamWithFlush(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .dropDuplicatesWithinWatermark("event_id")
      .withColumn("nk", col("user_id") % 25)
      .join(broadcast(dim), "nk")
    runToMemory(
      ev.groupBy(window(col("ts"), "1 day").as("w"), col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
            .as("sum_value"))
        .select(col("w.start").as("w_start"), col("n_name"),
          col("n_events"), col("sum_value")),
      "graft_s21", "append")
      .orderBy(col("w_start"), col("n_name"))
  }

  /** s22: the CUSTOM-STATE sessionizer ([[sessionize]],
    * `flatMapGroupsWithState` + event-time timeout — the Processor API
    * + punctuate shape) declared as an oracle query: 2 h inactivity
    * gap over the event stream, emitted on watermark close. The flush
    * sentinels advance the watermark past every real event so all real
    * sessions close; the sentinels' own 2100-era session stays open
    * (its end + gap is beyond the final watermark) and is therefore
    * never emitted — no post-filter needed. s09 is the declarative
    * `session_window` twin; this one proves the hand-rolled state
    * machine against the same gaps-and-islands SQL. */
  def streamFmgwsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStreamWithFlush(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props")).as[EventRow]
    runToMemory(
      sessionize(ev, 2L * 3600 * 1000, "10 minutes").toDF(),
      "graft_s22", "append")
      .orderBy(col("user_id"), col("s_start"))
  }

  /** s23: trigger-invariance under bounded micro-batches — the
    * backpressure contract. The month of events is split into three
    * time-ordered files (+ a flush sentinel) and consumed with
    * `maxFilesPerTrigger=1`, so the daily aggregation runs across FOUR
    * real triggers with the watermark advancing between them: early
    * windows close and emit after trigger 1 while later data is still
    * unread. The append-mode result must equal the all-at-once batch
    * aggregate — slicing the stream into bounded batches (what a rate
    * limit / backpressure control does to a Kafka consumer) may never
    * change the answer, only the emission schedule. */
  def streamBoundedTrigger(spark: SparkSession, sfDir: String): DataFrame = {
    val dirStr = orderedBatchDir(boundedTriggerDirs, sfDir, "events.parquet",
        "graft_bounded") {
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val day = dayofmonth(col("ts"))
      val flush = ev.limit(1)
        .withColumn("event_id", lit(-1L))
        .withColumn("ts", to_timestamp(lit("2100-01-01 00:00:00")))
        .select(ev.columns.map(col): _*)
      Seq(ev.filter(day <= 10), ev.filter(day > 10 && day <= 20),
        ev.filter(day > 20), flush)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
    runToMemory(
      stream.withWatermark("ts", "10 minutes")
        .filter(col("ts") < flushBound)
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
            .as("sum_value"))
        .select(col("w.start").as("w_start"), col("n"), col("sum_value")),
      "graft_s23", "append")
      .orderBy(col("w_start"))
  }

  private val nearDupDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s24: INCREMENTAL near-dup ingest — the streaming face of the d06
    * MinHash/LSH pipeline, driven as two mtime-ordered micro-batches:
    *   batch 0 — the "existing corpus" (even doc_ids): every corpus
    *     doc's 4 LSH band buckets fold into per-bucket state;
    *   batch 1 — the "incoming crawl" (odd doc_ids): each new doc
    *     probes its own 4 buckets against that state.
    * The declared result is, per incoming doc that hit ≥ 1 occupied
    * bucket: the minimum corpus doc sharing any band (min over buckets
    * of the per-bucket minimum = min of the union) and how many of its
    * 4 bands matched. The oracle recomputes the same bands in SQL
    * ([[graft.operators.TextOps.mhBandsCte]] — shared text, zero
    * drift) and joins odd against even, so what the hash verifies is
    * the incremental contract itself: state must hold exactly the
    * corpus batch, and probes must not see other incoming docs.
    *
    * Scale design: this is THE shape for deduping new data against an
    * already-ingested 100 TB corpus — the corpus is never rescanned; it
    * exists only as ≤ 4-buckets-per-doc state (RocksDB, one Long per
    * occupied bucket), and each incoming doc costs 4 point lookups. */
  def streamNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(nearDupDirs, sfDir, "documents.parquet",
        "graft_neardup") {
      val bands = graft.operators.TextOps.lshBands(spark, sfDir)
        .select(concat_ws(":", col("band"), col("bh")).as("bucket"),
          col("doc_id"))
      def side(tag: String) = lit(tag).as("side")
      Seq(
        bands.filter(col("doc_id") % 2 === 0)
          .select(col("bucket"), side("O"), col("doc_id")),
        bands.filter(col("doc_id") % 2 === 1)
          .select(col("bucket"), side("N"), col("doc_id")))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "bucket STRING, side STRING, doc_id BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[BandEvent]
      .groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[BandMatch])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s24", "update", Some(8),
        noDataBatch = false)
    }
      .groupBy(col("new_doc"))
      .agg(min(col("dup_of")).as("dup_of"),
        count(lit(1)).as("matched_bands"))
      .orderBy(col("new_doc"))
  }

  private val embNearDupDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s47: INCREMENTAL EMBEDDING near-dup ingest — the streaming face of
    * v08's sign-LSH (r10 verdict item 3: the one streaming seam left
    * unpaired — text near-dup has s24, media m08, embeddings had no
    * ingest face). Two mtime-ordered micro-batches over the SAME
    * `graft_lsh_bands` index definition as v08 (8 bands × 8 md5-parity
    * hyperplanes, the codegen'd LshBandCodes pass):
    *   batch 0 — the "existing corpus" (even vec_ids): each corpus
    *     vector's 8 (band, code) buckets fold into per-bucket state;
    *   batch 1 — the "incoming embeddings" (odd vec_ids): each new
    *     vector probes its own 8 buckets with point lookups.
    * Candidates — (per-bucket min corpus vec, incoming vec), the s24
    * bounded-state contract — are then EXACT-COSINE verified (the LSH
    * collision is a hint; the declared match is cos ≥ 0.4, v08's
    * threshold) in one batch enrichment join over the emitted pairs.
    * The oracle shares v08's band CTE text verbatim
    * ([[graft.operators.VectorOps.lshBandsCteSql]]) and replays the
    * probe as odd-against-even SQL, so the hash verifies the
    * incremental contract itself: state must hold exactly the corpus
    * batch, probes must not see other incoming vectors, and the
    * verify must not drop or invent candidates.
    *
    * Scale design: the 100 TB corpus is never rescanned — it exists
    * only as ONE Long per occupied band bucket (≤ 8 rows per corpus
    * vector, RocksDB; StateBoundSpec pins the bound), each incoming
    * vector costs 8 point lookups, and the cosine verify touches only
    * emitted candidates (≤ 8 per incoming vector before distinct) —
    * probe-bounded end to end, the same reason v08 itself never
    * nested-loops. */
  def streamEmbedNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(embNearDupDirs, sfDir, "embeddings.parquet",
        "graft_embneardup") {
      val bands = graft.operators.VectorOps.bandCodes(spark, sfDir)
        .select(concat_ws(":", col("band"), col("code")).as("bucket"),
          col("vec_id"))
      def side(tag: String) = lit(tag).as("side")
      Seq(
        bands.filter(col("vec_id") % 2 === 0)
          .select(col("bucket"), side("O"), col("vec_id").as("doc_id")),
        bands.filter(col("vec_id") % 2 === 1)
          .select(col("bucket"), side("N"), col("vec_id").as("doc_id")))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "bucket STRING, side STRING, doc_id BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[BandEvent]
      .groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[BandMatch])
      .toDF()
    val cand = withRocksDb(spark) {
      runToMemory(stream, "graft_s47", "update", Some(8),
        noDataBatch = false)
    }
      .select(col("dup_of").as("d1"), col("new_doc").as("d2"))
      .distinct()
    // exact-cosine verify — batch enrichment over the streamed
    // candidates only (both joins are candidate-sized, never corpus²)
    val e = graft.operators.VectorOps.embDouble(spark, sfDir)
    cand
      .join(e.select(col("vec_id").as("d1"), col("v").as("v1")), "d1")
      .join(e.select(col("vec_id").as("d2"), col("v").as("v2")), "d2")
      .withColumn("cos", call_function("graft_cosine", $"v1", $"v2"))
      .filter($"cos" >= 0.4)
      .select($"d1", $"d2", round($"cos", 6).as("cos"))
      .orderBy($"d1", $"d2")
  }

  private val serveDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** The s48 serving checkpoint for `sfDir`, if built this session —
    * exposed so StateBoundSpec can read the index store out-of-band. */
  private[graft] def serveCheckpoint(sfDir: String): Option[String] =
    serveDirs.get(sfDir).map(_._2)

  /** s48: the STREAMING SERVING capstone — v30's ingest face (r10
    * verdict item 7). The production retrieval loop is ingest → index
    * update → serve; v30 serves a STATIC index. This query closes the
    * loop as two phases over the same corpus:
    *
    * PHASE 1 (ingest/index update): the embeddings arrive as two
    * mtime-ordered micro-batches. In-stream, each vector is (a)
    * en-PRE-filtered against the documents table (v25's
    * filter-before-rank discipline, a stream-static join), (b)
    * assigned its IVF cell by argmax against the broadcast
    * 6-dp-rounded centroid model — s34's streaming-assignment shape —
    * and (c) scored against the query vector (same `graft_cosine`,
    * same round-6 as v30's candidate stage). Per cell, a
    * [[TopNProcessor]] (s18's bounded leaderboard, n = DivCap) folds
    * the scored vectors into ValueState: the state IS the serving
    * index — per-cell top-DivCap, updated as batches land, never a
    * corpus log (StateBoundSpec pins rows == occupied cells).
    *
    * PHASE 2 (serve): the store is read OUT-OF-BAND at the last
    * committed batchId (the s42/s43 interactive-query discipline — no
    * streaming query running), the query's DivProbe nearest cells
    * select which per-cell buffers serve, and v30's stages 4–5 run on
    * the ≤ DivProbe·DivCap surviving rows: ServeTau near-dup
    * suppression (broadcast-fed NL over a config-bounded pair matrix)
    * and the final top-5.
    *
    * The oracle IS v30's oracle — [[graft.operators.VectorOps
    * .retrievalPipelineSql]], shared verbatim — so the hash asserts
    * the full loop: a lost batch, a mis-assigned cell, a buffer that
    * evicted the wrong candidate, a stale-batchId read, or a drifted
    * suppression all surface as the served top-5 diverging from the
    * batch truth.
    *
    * Scale design: per-batch work is one pass over ARRIVING vectors
    * (codegen'd argmax over k broadcast centroids + one bounded fold);
    * state is cells × DivCap rows — config-bounded, not corpus-bounded;
    * the serve path touches DivProbe buffers and a ≤ 12-row tail. The
    * corpus is never rescanned after ingest. */
  def streamServeTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DivCap = graft.operators.VectorOps.DivCap
    val DivProbe = graft.operators.VectorOps.DivProbe
    val ServeTau = graft.operators.VectorOps.ServeTau
    val e = graft.operators.VectorOps.embDouble(spark, sfDir)
    val ckStr = cachedScratchDir(serveDirs, sfDir, "embeddings.parquet") {
      val in = newTempDir("graft_s48_in")
      val ck = newTempDir("graft_ckpt_s48")
      // bounded model artifacts broadcast into the stream plan: the
      // k×64 rounded centroids (s34) and the 64-double query vector
      val cents = graft.operators.VectorOps.labelCentroidsRounded(spark, sfDir)
      val qv = e.filter($"vec_id" === 0)
        .select($"v").head().getSeq[Double](0).toArray
      val allowed = graft.Tables.documents(spark, sfDir)
        .filter($"lang" === "en").select($"doc_id".as("vec_id"))
      val src = e.select($"vec_id", $"v")
      def half(i: Int) = src.filter(pmod($"vec_id", lit(2L)) === i)
      (0 to 1).foreach(i => writeChangelogFile(half(i), in, i))
      val scored = cents.map { case (cl, c) =>
        struct(call_function("graft_cosine", $"v", typedlit(c)).as("c"),
          lit(-cl).as("nl"))
      }
      withShufflePartitions(spark, 8) {
        withRocksDb(spark) {
          spark.readStream
            .schema(org.apache.spark.sql.types.StructType.fromDDL(
              "vec_id BIGINT, v ARRAY<DOUBLE>"))
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "changelog_*.parquet")
            .parquet(in.toString)
            .filter($"vec_id" =!= 0)
            .join(broadcast(allowed), "vec_id") // stream-static PRE-filter
            .withColumn("m", array_max(array(scored: _*)))
            .select((-$"m.nl").cast("string").as("event_type"),
              $"vec_id".as("event_id"),
              round(call_function("graft_cosine", $"v", typedlit(qv)), 6)
                .as("value"))
            .as[TopNEvent]
            .groupByKey(_.event_type)
            .transformWithState(new TopNProcessor(DivCap),
              org.apache.spark.sql.streaming.TimeMode.None(),
              OutputMode.Update(),
              org.apache.spark.sql.Encoders.product[TopNRow])
            .toDF()
            .writeStream.format("noop").outputMode("update")
            .option("checkpointLocation", ck.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start().awaitTermination()
        }
      }
      ck.toString
    }
    // the serving read: per-cell buffers out of the store at an
    // explicit committed batchId, probe-cell selection, then v30's
    // suppression + top-5 over the config-bounded tail
    val buffers = withRocksDb(spark) {
      spark.read.format("statestore")
        .option("path", ckStr)
        .option("stateVarName", "topn")
        .option("batchId", lastCommittedBatchId(ckStr).toString)
        .load()
        .select($"key.value".cast("int").as("cell"),
          $"value.ids".as("ids"), $"value.vals".as("vals"))
        .select($"cell", posexplode(arrays_zip($"ids", $"vals")))
        .select($"cell", $"col.ids".as("vec_id"), $"col.vals".as("cos"))
    }
    val probes = graft.operators.VectorOps.probeCells(spark, sfDir,
        DivProbe, graft.operators.VectorOps.queryVecDf(spark, sfDir))
      .select($"probe_cell")
    val ranked = buffers
      .join(broadcast(probes), $"cell" === $"probe_cell")
      .join(e.select($"vec_id", $"v"), "vec_id")
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("cos"), $"vec_id")).cast("long"))
    val sup = ranked.as("a")
      .join(broadcast(ranked.as("b")), col("a.r") < col("b.r"))
      .filter(call_function("graft_cosine", col("a.v"), col("b.v"))
        >= ServeTau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    ranked.join(sup, Seq("vec_id"), "left_anti")
      .orderBy($"r")
      .limit(5)
      .select($"vec_id", $"cell", $"cos")
  }

  private val cmsDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** The s49 CMS checkpoint for `sfDir`, if built this session —
    * exposed so StateBoundSpec can read the sketch store
    * out-of-band. */
  private[graft] def cmsCheckpoint(sfDir: String): Option[String] =
    cmsDirs.get(sfDir).map(_._2)

  /** s49: STREAMING COUNT-MIN — x05's ingest face, completing the
    * sketch-family symmetry (x01 batch ↔ x03 merge ↔ this for
    * frequencies; e54 ↔ s46 for quantiles; v30 ↔ s48 for serving).
    * Three %3-interleaved micro-batches of raw user_ids compute their
    * d = 4 row-salted md5 buckets IN-STREAM (a stateless codegen'd
    * projection — the same [[graft.operators.Extras.cmsBucket]]
    * expressions as the batch build) and fold per-(row, bucket)
    * counts into [[BinCountProcessor]]'s MapState — CMS cells are the
    * same commutative monoid as s46's histogram bins, so the
    * processor is REUSED VERBATIM (key = sketch row, map key =
    * bucket) and batch boundaries cannot change the counters. The
    * store is the product (s42's discipline): the serving read pulls
    * the cells at the last committed batchId and x05's probe read-off
    * ([[graft.operators.Extras.cmsProbe]] — one shared definition)
    * computes the estimates. Oracle = x05's oracle VERBATIM
    * (`countMinSql`): the streamed sketch must serve the batch truth.
    *
    * Scale design: per-batch work is d codegen'd md5s per arriving
    * row folding into ≤ d·w state entries (1024 — CONFIG-bounded,
    * never key- or event-bounded; StateBoundSpec pins it); the serve
    * path reads ≤ d·w rows and joins d rows per probed key. */
  def streamCountMin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ckStr = cachedScratchDir(cmsDirs, sfDir, "events.parquet") {
      val in = newTempDir("graft_s49_in")
      val ck = newTempDir("graft_ckpt_s49")
      val ev = graft.Tables.events(spark, sfDir)
        .select($"user_id", $"event_id")
      def third(i: Int) = ev.filter(pmod($"event_id", lit(3L)) === i)
        .select($"user_id")
      (0 to 2).foreach(i => writeChangelogFile(third(i), in, i))
      runBinFold(spark, in, ck, "user_id BIGINT") { raw =>
        raw.select(posexplode(array((0 until graft.operators.Extras.CmsD)
            .map(graft.operators.Extras.cmsBucket): _*)).as(Seq("r", "b")))
          .select($"r".cast("string").as("event_type"), $"b".as("bin"))
      }
      ck.toString
    }
    val cells = readBinCells(spark, ckStr, "r", "b", "c")
    graft.operators.Extras.cmsProbe(spark, sfDir, cells)
  }

  private val asOfDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s25: streaming AS-OF join (see [[AsOfJoinProcessor]]) in two
    * mtime-ordered micro-batches:
    *   batch 0 — reference side: every 'view' event as a (ts, value)
    *     quote, stored in per-user time-bucketed MapState;
    *   batch 1 — probe side: every 'purchase' event, each resolving
    *     the latest quote with ts ≤ its own (null if none — the
    *     left-outer as-of contract).
    * The oracle reproduces the same semantics as a windowed left range
    * join, so the hash verifies the temporal lookup itself: an
    * off-by-one on the ≤ bound, a wrong tiebreak, or a dropped
    * unmatched probe all change the result. */
  def streamAsOfJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(asOfDirs, sfDir, "events.parquet",
        "graft_asof") {
      val ev = graft.Tables.events(spark, sfDir)
      def shape(tpe: String, tag: String) = ev
        .filter(col("event_type") === tpe)
        .select(col("user_id"), lit(tag).as("side"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("value"))
      Seq(shape("view", "Q"), shape("purchase", "T"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, side STRING, ts_us BIGINT, event_id BIGINT, " +
        "value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AsOfJoinProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[AsOfJoined])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s25", "update", Some(8),
        noDataBatch = false)
    }
      .select($"trade_id", $"user_id",
        timestamp_micros($"trade_ts_us").as("trade_ts"),
        timestamp_micros($"quote_ts_us").as("quote_ts"),
        $"quote_value")
      .orderBy($"trade_id")
  }

  private val anomalyDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s30: streaming rolling z-score anomalies — the ingest face of e39
    * (the same pairing as d30/s26 and e36/s25): events arrive in two
    * time-partitioned micro-batches, each user's trailing-20 window is
    * carried in [[RollingAnomalyProcessor]] RocksDB state across the
    * batch boundary, and the declared result — the corpus-wide top-20
    * by exact integer z² — must equal the e39 batch oracle computed
    * over the whole month at once (incremental assembly ≡ batch truth).
    *
    * Scale design: per event, one bounded state read/write (≤ 20 longs
    * per live key); no window sort of the history, no rescan — the cost
    * model of per-entity monitoring over an unbounded stream. The final
    * top-20 is a TakeOrdered over only the emitted scores. */
  def streamRollingAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(anomalyDirs, sfDir, "events.parquet",
        "graft_anomaly") {
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
          col("value"))
      // time-partitioned batches: the trailing window must cross the
      // boundary via state, never via reordering
      val cutUs = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      Seq(ev.filter(col("ts_us") < cutUs), ev.filter(col("ts_us") >= cutUs))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts_us BIGINT, event_id BIGINT, cents BIGINT, " +
        "value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[AnomalyEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RollingAnomalyProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[AnomalyScore])
      .toDF()
    withRocksDb(spark) {
      runToMemory(stream, "graft_s30", "update", Some(8),
        noDataBatch = false)
    }
      .filter($"den" > 0)
      .select($"event_id", $"user_id",
        timestamp_micros($"ts_us").as("ts"),
        round($"value", 2).as("value"),
        graft.functions.Det.r4($"dev" * $"dev", $"den").as("z2"))
      .orderBy($"z2".desc, $"event_id")
      .limit(20)
  }

  /** Baseline/monitor split instant for s31, shared verbatim with its
    * oracle SQL (the cut is part of the query's semantics, unlike s30's
    * batch boundary which only shapes delivery). */
  private[graft] val CusumCut = "2024-01-15 00:00:00"

  private val cusumDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s31: streaming CUSUM mean-shift monitoring — the prospective
    * companion to the e41 batch scan: the first 14 days fix each user's
    * baseline level, the rest of the month is monitored against it with
    * [[CusumProcessor]]'s stateful max(0, C + y) recursion, and the
    * declared result is each monitored user's peak statistic with the
    * first event attaining it. Unlike e41, the reference level excludes
    * the future — this is the alerting semantics, and its oracle is a
    * different query (baseline join + prefix identity over the monitor
    * window only).
    *
    * Scale design: three longs of state per key, one state roundtrip
    * per event, no baseline rescan; the post-stream reduction touches
    * only emitted points. */
  def streamCusum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(cusumDirs, sfDir, "events.parquet",
        "graft_cusum") {
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      val cut = to_timestamp(lit(CusumCut))
      def side(f: Column, tag: String) = ev.filter(f)
        .select(col("user_id"), lit(tag).as("side"), col("ts_us"),
          col("event_id"), col("cents"))
      Seq(side(col("ts") < cut, "B"), side(col("ts") >= cut, "M"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, side STRING, ts_us BIGINT, event_id BIGINT, " +
        "cents BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[CusumEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CusumProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[CusumPoint])
      .toDF()
    val pts = withRocksDb(spark) {
      runToMemory(stream, "graft_s31", "update", Some(8),
        noDataBatch = false)
    }
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
    pts
      .withColumn("rn", row_number().over(
        byUser.orderBy($"c".desc, $"ts_us", $"event_id")))
      .withColumn("n_mon", count(lit(1)).over(byUser))
      .filter($"rn" === 1)
      .select($"user_id", $"n_base", $"n_mon",
        graft.functions.Det.r4($"c", $"n_base" * 100L).as("cusum_max"),
        timestamp_micros($"ts_us").as("cp_ts"),
        $"event_id".as("cp_event_id"))
      .orderBy($"user_id")
  }

  private val funnelDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s36: streaming ordered-funnel tracking — the ingest face of e44:
    * events arrive in three time-partitioned micro-batches, each user's
    * funnel progress (latest view / latest qualified click / purchased)
    * is carried in [[FunnelProcessor]] RocksDB state across the
    * boundaries, and the declared result — the per-depth user histogram
    * with reach counts and conversion rates — must equal the e44 batch
    * oracle computed over the whole month at once. Depth emissions are
    * monotone, so `max(stage)` per user over all update-mode emissions
    * IS the final depth — no retraction logic.
    *
    * Scale design: two timestamps + a flag of state per live key, one
    * state roundtrip per key per batch; the post-stream reduction
    * (shared verbatim with e44 via funnelReduce) touches one row per
    * user per batch, not per event. */
  def streamFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(funnelDirs, sfDir, "events.parquet",
        "graft_funnel") {
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
      // three time-partitioned batches: funnel ordering must cross the
      // boundaries via state, never via reordering
      def cutUs(day: Int): Long = java.time.LocalDateTime
        .of(2024, 1, day, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      Seq(ev.filter(col("ts_us") < cutUs(11)),
        ev.filter(col("ts_us") >= cutUs(11) && col("ts_us") < cutUs(21)),
        ev.filter(col("ts_us") >= cutUs(21)))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts_us BIGINT, event_id BIGINT, event_type STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[FunnelDepth])
      .toDF()
    val depths = withRocksDb(spark) {
      runToMemory(stream, "graft_s36", "update", Some(8),
        noDataBatch = false)
    }
    graft.operators.Events.funnelReduce(
      depths.groupBy($"user_id").agg(max($"stage").as("stage")))
  }

  private val attribDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s37: streaming last-touch attribution — the ingest face of e47,
    * and the KStream⋈KTable join under continuous ingest: the click
    * stream materializes as latest-click-per-user state
    * ([[AttributionProcessor]], one (µs, channel) per user in RocksDB),
    * each purchase does a point lookup at its own event-time and emits
    * its attribution exactly once, in the micro-batch that delivers
    * it. The declared result — per-channel purchases/revenue/lag via
    * the SHARED [[graft.operators.Events.attributionReduce]] — must
    * equal the e47 batch oracle over the whole month (incremental
    * assembly ≡ batch LOCF window).
    *
    * Scale design: state is the as-of ANSWER (latest click), not the
    * click history — constant per user however dense the stream; one
    * state roundtrip per user per batch; channel parsing happens
    * map-side in the changelog build via the shared channelOf
    * expression. */
  def streamAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(attribDirs, sfDir, "events.parquet",
        "graft_attrib") {
      val ev = graft.Tables.events(spark, sfDir)
        .withColumn("kb",
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT) % 4"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"),
          when(col("event_type") === "click",
            graft.operators.Events.channelOf(col("kb")))
            .otherwise("").as("channel"),
          when(col("event_type") === "purchase", col("value"))
            .otherwise(0.0).as("value"))
        .filter(col("event_type").isin("click", "purchase"))
      def cutUs(day: Int): Long = java.time.LocalDateTime
        .of(2024, 1, day, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      Seq(ev.filter(col("ts_us") < cutUs(11)),
        ev.filter(col("ts_us") >= cutUs(11) && col("ts_us") < cutUs(21)),
        ev.filter(col("ts_us") >= cutUs(21)))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts_us BIGINT, event_id BIGINT, event_type STRING, " +
        "channel STRING, value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[AttribEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[AttribHit])
      .toDF()
    val hits = withRocksDb(spark) {
      runToMemory(stream, "graft_s37", "update", Some(8),
        noDataBatch = false)
    }
    graft.operators.Events.attributionReduce(
      hits.select($"channel",
        when($"lag_s" >= 0, $"lag_s").as("lag_s"), $"value"))
  }

  private val lateDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s38: GRACE / LATE-DATA semantics under the oracle gate — the last
    * §2 row that had been spec-only "by nature": it isn't, once the
    * replay is deterministic. Events replay INTERLEAVED (batch =
    * event_id % 3, so every batch spans the whole month and batches
    * 2–3 are massively late), a 2-day watermark closes daily windows
    * as the running max event time advances, and late rows for closed
    * windows are DROPPED. The declared result is the surviving daily
    * (window, type) counts in append mode.
    *
    * The drop rule is pinned empirically (WatermarkSemanticsSpec): a
    * row is dropped iff its WINDOW END ≤ the late-events watermark — a
    * row whose raw ts is behind the watermark but whose window is
    * still open IS counted — and, crucially, Spark's stateful
    * operators filter late events with the PREVIOUS batch's watermark
    * (`watermarkForLateEvents`) while emitting/evicting with the
    * current one (`watermarkForEviction`; the two-watermark design of
    * SPARK-24634). The oracle replays exactly that: the keep threshold
    * for batch b is the running max event time of batches ≤ b−2 minus
    * the 2-day delay (one batch of extra lag), and a window appears in
    * the append output only once the FINAL eviction watermark (global
    * max − 2 days) passes its end. Batch boundaries are part of the
    * declared contract (as s30/s36's time-partitioned cuts are).
    *
    * Scale design: one windowed streaming aggregation with watermarked
    * state (bounded: open windows only); the changelog build is one
    * pass over events. */
  def streamLateData(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(lateDirs, sfDir, "events.parquet",
        "graft_late") {
      val ev = graft.Tables.events(spark, sfDir)
        .select($"ts", $"event_type", $"event_id")
      (0 until 3).map(i => ev.filter($"event_id" % 3 === i)
        .select($"ts", $"event_type"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, event_type STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .withWatermark("ts", "2 days")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"event_type", $"n")
    // The oracle's one-batch watermark lag (ROWS ... 2 PRECEDING) holds
    // only if the three file triggers run as exactly batches 0/1/2 with
    // NO interleaved no-data batch. Pin that schedule: measured, the
    // terminal batchId is 2 — the three %3-interleaved batches all span
    // the whole month, so the final file batch advances the watermark
    // by seconds only, closes no additional daily window, and
    // AvailableNow terminates without a trailing no-data batch. A Spark
    // upgrade that interleaves a no-data batch (shifting the lag) or
    // appends one (harmless but schedule-changing) fails this loudly.
    runToMemory(stream, "graft_s38", "append",
        assertLastBatchId = Some(2L))
      .orderBy($"w_start", $"event_type")
  }

  private val cdcDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s39: streaming CDC snapshot ingest — the d49 diff's streaming
    * face (the e47/s37 pairing): the old snapshot loads per-key hashes
    * into [[CdcProcessor]] RocksDB state in batch 1, the new snapshot
    * classifies against it in batch 2 (added/changed/unchanged), and
    * the declared report is the SHARED
    * [[graft.operators.TextOps.snapshotDiffReduce]] over the emissions
    * — d49's rollup minus `removed`, which arrival-side CDC cannot see
    * (the oracle states the same). Snapshot sides come from the shared
    * [[graft.operators.TextOps.snapshotSides]] projections, so batch
    * and streaming faces cannot drift.
    *
    * Scale design: one (hash, chars) per key in state, one point
    * lookup per arriving doc, no snapshot rescan — the append-only
    * ingest shape of s24/s26. */
  def streamCdcDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(cdcDirs, sfDir, "documents.parquet",
        "graft_cdc") {
      val (old, nw) = graft.operators.TextOps.snapshotSides(spark, sfDir)
      Seq(old.withColumn("side", lit("O")),
        nw.withColumn("side", lit("N")))
        .map(_.select(col("k"), col("side"), col("h"), col("chars")))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, side STRING, h STRING, chars BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[SnapEvent]
      .groupByKey(_.k)
      .transformWithState(new CdcProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[CdcEmit])
      .toDF()
    val hits = withRocksDb(spark) {
      runToMemory(stream, "graft_s39", "update", Some(8),
        noDataBatch = false)
    }
    graft.operators.TextOps.snapshotDiffReduce(
      hits.select($"k", $"status", $"new_chars", $"old_chars"))
  }

  private val noveltyDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s26: INCREMENTAL novelty scoring — the streaming face of d30, and
    * s24's n-gram-level companion: the corpus batch (even doc_ids)
    * loads every distinct 3-token shingle into per-shingle state; the
    * incoming batch (odd doc_ids) probes, and each incoming doc's
    * novelty is the fraction of its shingles the corpus does NOT hold.
    * Reuses [[NearDupProcessor]] verbatim — the bucket key is the raw
    * shingle instead of an LSH band, the emitted match count per doc is
    * the SEEN-shingle count, and the post-aggregation joins the
    * batch-side shingle counts to surface zero-match docs. The shingle
    * table is [[graft.operators.TextOps.distinctShingles]] — shared
    * text with d30's batch contract, zero drift.
    *
    * Scale design: state is one Long per distinct corpus shingle (the
    * RocksDB-backed inverted vocabulary); each incoming doc costs one
    * point lookup per shingle — no corpus rescan, the same
    * append-only-ingest shape as s24. */
  def streamNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val shingles = graft.operators.TextOps.distinctShingles(spark, sfDir)
    val dirStr = orderedBatchDir(noveltyDirs, sfDir, "documents.parquet",
        "graft_novelty") {
      def side(parity: Int, tag: String) = shingles
        .filter(col("doc_id") % 2 === parity)
        .select(col("s").as("bucket"), lit(tag).as("side"), col("doc_id"))
      Seq(side(0, "O"), side(1, "N"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "bucket STRING, side STRING, doc_id BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[BandEvent]
      .groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[BandMatch])
      .toDF()
    val seen = withRocksDb(spark) {
      runToMemory(stream, "graft_s26", "update", Some(8),
        noDataBatch = false)
    }
      .groupBy(col("new_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_seen"))
    shingles.filter(col("doc_id") % 2 === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(seen, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_seen"))
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - col("n_seen")).as("n_novel"),
        graft.functions.Det.r4(
          col("n_grams") - col("n_seen"), col("n_grams")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  private val indexDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s29: streaming inverted-index maintenance — the d37 batch build's
    * ingest face (the s24/s26 pattern applied to retrieval): documents
    * arrive in two ordered batches (even doc_ids, then odd), each
    * batch's (term, doc, tf) rows fold into per-term RocksDB state via
    * [[IndexStatsProcessor]], and the declared result is the final
    * top-50-df index snapshot — which must equal the batch oracle
    * computed over the whole corpus at once (streaming assembly ≡
    * batch truth).
    *
    * Scale design: per batch only TOUCHED terms do work (one state
    * point-lookup + update each); the index is never rebuilt and never
    * rescanned, state is two Longs per distinct term. The top-50 cut
    * happens AFTER the stream on the emitted snapshot rows (bounded:
    * ≤ touched-terms rows per batch). */
  def streamInvertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dirStr = orderedBatchDir(indexDirs, sfDir, "documents.parquet",
        "graft_index") {
      val tf = graft.operators.TextOps.docsWithToks(spark, sfDir)
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      Seq(tf.filter(col("doc_id") % 2 === 0), tf.filter(col("doc_id") % 2 === 1))
        .map(_.select(col("term"), col("doc_id"), col("tf")))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "term STRING, doc_id BIGINT, tf BIGINT")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(dirStr)
      .as[TermDocTf]
      .groupByKey(_.term)
      .transformWithState(new IndexStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[TermStats])
      .toDF()
    val emitted = withRocksDb(spark) {
      runToMemory(stream, "graft_s29", "update", Some(8),
        noDataBatch = false)
    }
    // latest emission per term: df is monotone across batches
    emitted.groupBy(col("term"))
      .agg(max(struct(col("df"), col("tf_total"))).as("m"))
      .select(col("term"), col("m.df").as("df"),
        col("m.tf_total").as("tf_total"))
      .orderBy(desc("df"), col("term")).limit(50)
  }

  /** s34: streaming IVF cell assignment — the ingest seam between the
    * vector suite and the streaming suite: incoming embeddings are
    * scored against the v07 coarse-quantizer centroids and routed to
    * their nearest cell, the model-serving step that keeps a streaming
    * corpus partitioned the way the batch IVF index (v07) expects.
    *
    * The model is broadcast state: k×64 doubles collected once
    * ([[graft.operators.VectorOps.labelCentroidsRounded]] — 6-dp
    * rounded per the v09 Lloyd contract so both engines score against
    * bit-identical values), inlined as literals so each incoming row
    * costs k codegen'd cosines and an argmax via struct ordering
    * (cos DESC, then smaller label — same tiebreak as v07's
    * row_number). Stateless: no watermark, no state store, append
    * mode with the no-data batch skipped — the cheapest streaming
    * shape, and exactly how a 1000-executor ingest job would run it
    * (the model rides the closure; the stream never shuffles).
    *
    * Oracle: shares v07's cent/cv/e CTE text (ivfCentCte) and the
    * cosine fragment, adds the same round(c, 6) the v09 oracle uses,
    * and reproduces the argmax with a row_number — so the hash
    * verifies the served model matches the batch index definition. */
  def streamIvfAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = graft.operators.VectorOps.labelCentroidsRounded(spark, sfDir)
    val schema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
    val scored = cents.map { case (cl, c) =>
      struct(call_function("graft_cosine", $"v", typedlit(c)).as("c"),
        lit(-cl).as("nl"))
    }
    val assigned = stream
      .withColumn("m", array_max(array(scored: _*)))
      .select($"vec_id", (-$"m.nl").as("cell"), round($"m.c", 6).as("ccos"))
    runToMemory(assigned, "graft_s34", "append", noDataBatch = false)
      .orderBy($"vec_id")
  }

  /** s35: `peek`/`foreach` under the oracle gate — the side-effecting
    * terminal consumer of the Kafka Streams DSL, expressed the way
    * Structured Streaming prescribes it: a foreachBatch sink folding
    * each micro-batch's bounded per-type aggregate into an external
    * store (a driver-side map here, standing in for the KV store /
    * metrics sink a cluster job updates). The DECLARED result is
    * rebuilt from the side-effect store ONLY — a skipped batch, a
    * double-applied one, or a dropped type changes the hash, which is
    * exactly the at-least-once-plus-idempotent-merge contract
    * foreachBatch asks its user to uphold.
    *
    * Scale design: per batch only the ≤5-row per-type aggregate is
    * collected (the bounded-aggregate export pattern — map-side
    * combine does the heavy lifting), never event rows; counts and
    * exact decimal sums are merged across batches, so trigger layout
    * cannot change the answer. */
  def streamForeachCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val sums =
      new java.util.concurrent.ConcurrentHashMap[String, java.math.BigDecimal]()
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    try {
      eventsStream(spark, sfDir)
        .select($"event_type", $"value")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.groupBy($"event_type")
            .agg(count(lit(1)).as("n"),
              sum($"value".cast("decimal(18,4)")).as("s"))
            .collect().foreach { r =>
              val t = r.getString(0)
              counts.merge(t, r.getLong(1), (a, b) => a + b)
              sums.merge(t, r.getDecimal(2), (a, b) => a.add(b))
            }
          ()
        }
        .option("checkpointLocation",
          newTempDir("graft_ckpt_s35").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally spark.conf.set(key, prev)
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.map { case (t, n) =>
      // the Det.dsum contract, replicated driver-side: exact decimal
      // sum → double → HALF_UP 2-dp (what Spark's round(double, 2)
      // does), matching the oracle's round(CAST(sum AS DOUBLE), 2)
      val d = java.math.BigDecimal.valueOf(sums.get(t).doubleValue)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
      (t, n, d)
    }.toDF("event_type", "n", "sum_value").orderBy($"event_type")
  }

  private val foreachEosDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** Evidence that [[streamForeachExactlyOnce]]'s replay actually
    * happened: batch count, total foreachBatch invocations (including
    * duplicates), and whether the redelivered batch carried
    * bit-identical rows. Surfaced for the spec; the declared query
    * requires the duplicate occurred. */
  private[graft] case class ForeachEvidence(nBatches: Int,
      nDeliveries: Int, dupIdentical: Boolean)

  /** s41: EXACTLY-ONCE foreachBatch sink semantics — the Kafka Streams
    * EOS analogue, forced: the per-type aggregate of each micro-batch
    * is written to an external store keyed by batchId with
    * put-if-absent (the batchId-idempotent write Spark's docs
    * prescribe for foreachBatch sinks), and the harness then FORCES a
    * duplicate delivery by deleting the checkpoint's latest commit-log
    * entry and restarting — exactly the crash window where a real sink
    * sees the same batch twice (processed, externally applied, died
    * before the commit log fsync). The redelivered batch must carry
    * identical rows (the offset log pins its file set) and must not
    * change the store (idempotence); the declared result is rebuilt
    * from the store only and must hash-match the whole-table oracle.
    * A non-idempotent merge would double-count the replayed batch and
    * flip the hash; a lost batch would shrink it.
    *
    * Scale design: like s35, only the ≤5-row per-type per-batch
    * aggregate crosses to the store — map-side combine does the heavy
    * lifting; the idempotence key (batchId) is Spark's own replay
    * unit, so the contract holds under any trigger layout. */
  private[graft] def runForeachExactlyOnce(spark: SparkSession,
      sfDir: String): (DataFrame, ForeachEvidence) = {
    import spark.implicits._
    val dirStr = orderedBatchDir(foreachEosDirs, sfDir, "events.parquet",
        "graft_s41") {
      val ev = graft.Tables.events(spark, sfDir)
        .select($"event_type", $"value", $"event_id")
      (0 until 3).map(i => ev.filter($"event_id" % 3 === i)
        .select($"event_type", $"value"))
    }
    val store = scala.collection.concurrent.TrieMap
      .empty[Long, Array[(String, Long, java.math.BigDecimal)]]
    val deliveries = new java.util.concurrent.atomic.AtomicInteger(0)
    val dupIdentical = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ck = newTempDir("graft_ckpt_s41")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_type STRING, value DOUBLE")
    def runOnce(): Unit = withShufflePartitions(spark, 2) {
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "changelog_*.parquet")
        .parquet(dirStr)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val rows = batch.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,4)")).as("s"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
            .sortBy(_._1)
          deliveries.incrementAndGet()
          store.putIfAbsent(batchId, rows) match {
            case Some(prior) =>   // duplicate delivery: store unchanged
              if (prior.sameElements(rows)) dupIdentical.set(true)
            case None => ()
          }
          ()
        }
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    runOnce()
    // Crash injection: drop the newest commit-log entry. The offset log
    // still holds the batch, so on restart Spark re-executes it from
    // the SAME recorded file offsets and redelivers it to foreachBatch
    // with the SAME batchId — the documented at-least-once window that
    // batchId-idempotent writes exist to close. The local Hadoop FS
    // keeps a `.N.crc` sidecar per log entry; it must go with the
    // entry or the replayed commit write collides on the CRC rename.
    val commits = ck.resolve("commits")
    // one definition of "newest committed batch" (the shared
    // commit-log reader); its require is the empty-log diagnostic —
    // an empty log after run 1 means there is nothing to replay
    val latest =
      commits.resolve(lastCommittedBatchId(ck.toString).toString)
    java.nio.file.Files.delete(latest)
    java.nio.file.Files.deleteIfExists(
      commits.resolve(s".${latest.getFileName}.crc"))
    runOnce()
    val merged = store.values.flatten.toSeq
      .groupBy(_._1).toSeq.map { case (t, rs) =>
        val n = rs.map(_._2).sum
        val s = rs.map(_._3).reduce(_.add(_))
        // the Det.dsum contract replicated driver-side (see s35)
        val d = java.math.BigDecimal.valueOf(s.doubleValue)
          .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
        (t, n, d)
      }
    (merged.toDF("event_type", "n", "sum_value").orderBy($"event_type"),
      ForeachEvidence(store.size, deliveries.get(), dupIdentical.get()))
  }

  def streamForeachExactlyOnce(spark: SparkSession,
      sfDir: String): DataFrame = {
    val (df, ev) = runForeachExactlyOnce(spark, sfDir)
    // the replay must actually have happened, with identical rows —
    // otherwise this query proves nothing and should fail loudly
    require(ev.nDeliveries == ev.nBatches + 1 && ev.dupIdentical,
      s"s41: expected exactly one identical duplicate delivery, got " +
        s"${ev.nDeliveries} deliveries over ${ev.nBatches} batches " +
        s"(dupIdentical=${ev.dupIdentical})")
    df
  }

  private val iqDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s42: QUERYABLE STATE — Kafka Streams' Interactive Queries surface,
    * the one §2-adjacent capability prior rounds listed as missing "no
    * mid-run store-read API". Spark 4's state data source IS that API:
    * a streaming changelog query (the [[LatestEventProcessor]] KTable
    * materialization) runs to completion leaving its RocksDB checkpoint
    * behind, and the store is then read OUT-OF-BAND with
    * `spark.read.format("statestore")` — no query running, exactly how
    * an ops console or serving layer reads a Kafka Streams store via
    * IQ. The declared result is the store CONTENT (latest event per
    * user), which must hash-match the batch latest-by-key oracle: a
    * stale store, a lost key, or a wrong changelog reduction all flip
    * the hash.
    *
    * Scale design: the store read is partition-parallel over the
    * checkpoint's state files (one task per store partition, no
    * replay of the source), so serving-layer reads cost O(state), not
    * O(history) — the IQ promise. */
  /** Resolve the newest committed batchId from a checkpoint's commit
    * log, so state-source reads pin an EXPLICIT batch instead of the
    * implicit "latest" — replay-stable (a later run appending batches
    * cannot change what this read returns) and the serving-layer
    * time-travel mechanism (pass an older id to read an earlier store
    * version; StateSourceBatchIdSpec exercises that path). */
  private[graft] def lastCommittedBatchId(ck: String): Long = {
    val dir = new java.io.File(ck, "commits")
    val ids = Option(dir.list()).getOrElse(Array.empty[String])
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
    require(ids.nonEmpty, s"no commit-log entries under $ck/commits")
    ids.max
  }

  def streamQueryableState(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ckStr = cachedScratchDir(iqDirs, sfDir, "events.parquet") {
      val ck = newTempDir("graft_ckpt_s42")
      withShufflePartitions(spark, 8) {
        withRocksDb(spark) {
          eventsStream(spark, sfDir).as[EventRow]
            .groupByKey(_.user_id)
            .transformWithState(new LatestEventProcessor,
              org.apache.spark.sql.streaming.TimeMode.None(),
              OutputMode.Update(),
              org.apache.spark.sql.Encoders.product[LatestEvent])
            .toDF()
            .writeStream
            // the changelog consumer is irrelevant here — the STORE is
            // the product (a real deployment tees this to Kafka/a sink)
            .format("noop")
            .outputMode("update")
            .option("checkpointLocation", ck.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
            .awaitTermination()
        }
      }
      ck.toString
    }
    // the Interactive Query: read the named state variable from the
    // last committed batch's store, with no streaming query running
    withRocksDb(spark) {
      spark.read.format("statestore")
        .option("path", ckStr)
        .option("stateVarName", "latest")
        .option("batchId", lastCommittedBatchId(ckStr).toString)
        .load()
        .select($"value.user_id", $"value.event_id", $"value.ts_us",
          $"value.event_type", round($"value.value", 2).as("value"))
        .orderBy($"user_id")
    }
  }

  private val bootstrapDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** s43: STATE BOOTSTRAP — the Kafka Streams changelog-restore /
    * KTable warm-start path, s42's companion on the write side: a new
    * deployment must not replay the topic from offset 0, it loads an
    * OFFLINE SNAPSHOT (the compacted changelog: per-user (count, cents)
    * totals over the month's first half, computed in batch) into state
    * via `transformWithState`'s initial-state overload, then consumes
    * only the increments (the second half). The declared result is the
    * final STORE CONTENT read through the state source (the store, not
    * the changelog, is the truth), and it must hash-match the
    * whole-table per-user totals oracle: snapshot(prefix) ⊕
    * increments(suffix) ≡ full replay.
    *
    * The aggregate is deliberately ADDITIVE, so the restore is
    * load-bearing on EVERY key — a latest-by-key variant would pass
    * even with the snapshot dropped (every fixture user has post-cut
    * events; later events win). Here a lost snapshot row halves a
    * key's count, a double-initialized key doubles it, an increment
    * folded into empty state truncates the sum — all flip the hash.
    * The cut is mid-day (Jan 16 09:30) so both sides are non-trivial
    * for every key.
    *
    * Scale design: the snapshot load is one state write per key, the
    * increment stream touches only arriving keys, and the final read
    * is partition-parallel over the checkpoint — no path replays
    * history. */
  def streamStateBootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = to_timestamp(lit("2024-01-16 09:30:00"))
    // the s31 cents discipline: double→cents in each engine's round()
    val centsCol = expr("CAST(round(value * 100, 0) AS BIGINT)")
    val ckStr = cachedScratchDir(bootstrapDirs, sfDir, "events.parquet") {
      val ck = newTempDir("graft_ckpt_s43")
      // the offline snapshot: batch per-user totals over the first half
      val snapshot = graft.Tables.events(spark, sfDir)
        .filter($"ts" < cut)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum(centsCol).as("cents"))
        .as[UserCounts]
      withShufflePartitions(spark, 8) {
        withRocksDb(spark) {
          eventsStream(spark, sfDir)
            .filter($"ts" >= cut)
            .select($"user_id", centsCol.as("cents"))
            .as[UserDelta]
            .groupByKey(_.user_id)
            .transformWithState(new CountBootstrapProcessor,
              org.apache.spark.sql.streaming.TimeMode.None(),
              OutputMode.Update(),
              snapshot.groupByKey(_.user_id),
              org.apache.spark.sql.Encoders.product[UserCounts],
              org.apache.spark.sql.Encoders.product[UserCounts])
            .toDF()
            .writeStream
            .format("noop")
            .outputMode("update")
            .option("checkpointLocation", ck.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
            .awaitTermination()
        }
      }
      ck.toString
    }
    withRocksDb(spark) {
      spark.read.format("statestore")
        .option("path", ckStr)
        .option("stateVarName", "totals")
        .option("batchId", lastCommittedBatchId(ckStr).toString)
        .load()
        .select($"value.user_id", $"value.n_events", $"value.cents")
        .orderBy($"user_id")
    }
  }

  private val evoDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** Avro state encoding for the duration of `body` — the setting that
    * buys transformWithState STATE SCHEMA EVOLUTION (the default
    * UnsafeRow encoding is layout-exact and rejects any schema change
    * across restart). */
  private[graft] def withAvroState[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.encodingFormat"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "avro")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** s44: STATE SCHEMA EVOLUTION across a restart — the rolling-upgrade
    * story: version 1 of a deployment accumulates per-user (count,
    * cents) totals over the month's first half and is stopped; version
    * 2 adds a field (`cents_new`, revenue SINCE the upgrade — an
    * Option, so pre-upgrade state rows surface as None) and restarts
    * from the SAME checkpoint, folding the second half. Avro state
    * encoding makes the widened schema readable over v1 bytes; the
    * declared result is the final store content and must hash-match an
    * oracle that computes full-table counts/cents plus second-half-only
    * cents_new — so a state wipe on upgrade (counts halved), a
    * misaligned default (cents_new polluted by pre-upgrade revenue), or
    * a failed schema check (query crashes) are all caught.
    *
    * Scale design: the upgrade migrates NOTHING eagerly — v1 rows are
    * reinterpreted lazily on first read, which is the only migration
    * strategy that works when the store holds 10⁹ keys. */
  def streamStateEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = to_timestamp(lit("2024-01-16 09:30:00"))
    val centsCol = expr("CAST(round(value * 100, 0) AS BIGINT)")
    val ckStr = cachedScratchDir(evoDirs, sfDir, "events.parquet") {
      val in = newTempDir("graft_s44_in")
      val ck = newTempDir("graft_ckpt_s44")
      val ev = graft.Tables.events(spark, sfDir)
      def half(cond: Column) = ev.filter(cond)
        .select($"user_id", centsCol.as("cents"))
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, cents BIGINT"))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "changelog_*.parquet")
        .parquet(in.toString)
        .as[UserDelta]
        .groupByKey(_.user_id)
      def runLeg(out: DataFrame): Unit =
        withShufflePartitions(spark, 8) {
          withRocksDb(spark) {
            withAvroState(spark) {
              out.writeStream.format("noop").outputMode("update")
                .option("checkpointLocation", ck.toString)
                .trigger(
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
                .start().awaitTermination()
            }
          }
        }
      writeChangelogFile(half($"ts" < cut), in, 0)
      runLeg(src.transformWithState(new CountV1Processor,       // v1 era
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[UserCounts]).toDF())
      writeChangelogFile(half($"ts" >= cut), in, 1)
      runLeg(src.transformWithState(new CountV2Processor,       // upgrade
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[UserCountsV2]).toDF())
      ck.toString
    }
    withRocksDb(spark) {
      withAvroState(spark) {
        spark.read.format("statestore")
          .option("path", ckStr)
          .option("stateVarName", "totals")
          .option("batchId", lastCommittedBatchId(ckStr).toString)
          .load()
          .select($"value.user_id", $"value.n_events", $"value.cents",
            $"value.cents_new")
          .orderBy($"user_id")
      }
    }
  }

  private val binMedDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** The shared s46/s49 MONOID-FOLD harness (the r11 review's
    * duplication finding): stream `schemaDdl`-shaped changelog rows
    * from `in`, `shape` them into BinDelta (key, bin) rows, fold into
    * [[BinCountProcessor]] MapState under checkpoint `ck`, noop sink —
    * the store is the product (s42's discipline). */
  private def runBinFold(spark: SparkSession, in: java.nio.file.Path,
      ck: java.nio.file.Path, schemaDdl: String)(
      shape: DataFrame => DataFrame): Unit = {
    import spark.implicits._
    withShufflePartitions(spark, 8) {
      withRocksDb(spark) {
        shape(spark.readStream
            .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "changelog_*.parquet")
            .parquet(in.toString))
          .as[BinDelta]
          .groupByKey(_.event_type)
          .transformWithState(new BinCountProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update(),
            org.apache.spark.sql.Encoders.product[BinDelta])
          .toDF()
          .writeStream.format("noop").outputMode("update")
          .option("checkpointLocation", ck.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
    }
  }

  /** The matching serving read: BinCountProcessor's flattened MapState
    * (one row per (grouping key, map key)) at the last committed
    * batchId, with caller-chosen column names. */
  private def readBinCells(spark: SparkSession, ckStr: String,
      key: String, mapKey: String, cnt: String): DataFrame =
    withRocksDb(spark) {
      import spark.implicits._
      spark.read.format("statestore")
        .option("path", ckStr)
        .option("stateVarName", "bins")
        .option("batchId", lastCommittedBatchId(ckStr).toString)
        .load()
        .select($"key.value".as(key), $"user_map_key.value".as(mapKey),
          $"user_map_value.value".as(cnt))
    }

  /** s46: STREAMING APPROX MEDIAN — e54's "bin counts are mergeable
    * monoid state" claim made real. Three %3-interleaved micro-batches
    * fold per-(event_type, $1-bin) counts into [[BinCountProcessor]]'s
    * MapState (bin → count; see its scaladoc for why ValueState would
    * be wrong); the store — read out-of-band at an explicit batchId,
    * the s42/s43 serving discipline — IS the product, and e54's cumsum
    * read-off computes the approx median from the bins alone. The
    * result must hash-match the batch e54 median formula exactly: a
    * lost batch, a double-fold, or a bin drifting one slot flips it.
    *
    * Scale design: state per key is the BIN TABLE (≤ value-range/width
    * entries — bounded, unlike a value log), each batch touches only
    * arriving keys, the store read is partition-parallel over the
    * checkpoint, and the read-off windows run over bins, never events.
    * This is the 100 TB streaming-median shape: e53's exact per-group
    * rank-sorts cannot stream; monoid bins can. */
  def streamBinnedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val B = graft.operators.Events.MadBinCents
    val ckStr = cachedScratchDir(binMedDirs, sfDir, "events.parquet") {
      val in = newTempDir("graft_s46_in")
      val ck = newTempDir("graft_ckpt_s46")
      val ev = graft.Tables.events(spark, sfDir)
        .select($"event_type", $"event_id",
          graft.functions.Det.fdiv(
            expr("CAST(round(value * 100, 0) AS BIGINT)"), lit(B))
            .as("bin"))
      def third(i: Int) = ev.filter(pmod($"event_id", lit(3L)) === i)
        .select($"event_type", $"bin")
      (0 to 2).foreach(i => writeChangelogFile(third(i), in, i))
      runBinFold(spark, in, ck, "event_type STRING, bin BIGINT")(identity)
      ck.toString
    }
    // the serving read: bins out of the store (the flattened MapState
    // layout — one row per (grouping key, map key)), e54's read-off on
    // top
    val bins = readBinCells(spark, ckStr, "event_type", "bin", "bc")
    val w = org.apache.spark.sql.expressions.Window
    val wCum = w.partitionBy($"event_type").orderBy($"bin")
    val wN = w.partitionBy($"event_type")
    import graft.functions.Det
    bins
      .withColumn("cum", sum($"bc").over(wCum.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("n", sum($"bc").over(wN))
      .withColumn("target", Det.fdiv($"n" + 1L, lit(2L)))
      .filter($"cum" >= $"target" && $"cum" - $"bc" < $"target")
      .select($"event_type", $"n",
        Det.r4($"bin" * B +
            Det.fdiv(($"target" - ($"cum" - $"bc")) * B, $"bc"),
          lit(100L)).as("approx_median"))
      .orderBy($"event_type")
  }

  private val restartDirs =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** The s40 tumbling aggregation, shared by both query runs — restart
    * recovery requires the restarted query to be the SAME plan, so the
    * construction is factored to a single site. */
  private[graft] def restartAggStream(spark: SparkSession,
      in: java.nio.file.Path): DataFrame = {
    import graft.functions.Det.dsum
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "changelog_*.parquet")
      .parquet(in.toString)
      .withWatermark("ts", "10 minutes")
      .filter(col("ts") < flushBound)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** One AvailableNow run of the s40 query against checkpoint `ck` and
    * file sink `out`; returns the terminal batchId (−1 if no batch ran).
    * RocksDB + changelog checkpointing, so the restart exercises the
    * production recovery path: state rebuilt from per-batch changelogs,
    * not an in-memory carryover. */
  private[graft] def runRestartLeg(spark: SparkSession, in: java.nio.file.Path,
      out: java.nio.file.Path, ck: java.nio.file.Path): Long =
    withShufflePartitions(spark, 8) {
      withRocksDb(spark) {
        val q = restartAggStream(spark, in).writeStream
          .format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ck.toString)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      }
    }

  /** s40: CHECKPOINT-KILL-RESTART RECOVERY under the oracle gate — the
    * fault-tolerance property a 100 TB deployment exercises that no
    * single-run query can: a streaming query is stopped after batch k
    * of n, a NEW query instance restarts from the checkpoint, and the
    * combined output must still hash-match the batch oracle (s01's
    * tumbling contract, the s38 promotion pattern applied to fault
    * tolerance).
    *
    * The replay is deterministic: events cut time-ordered at two
    * MID-DAY instants (Jan 11 07:00, Jan 21 13:00), so the daily
    * window at each cut spans two micro-batches. Run 1 sees only
    * batches 0–1 and terminates — the Jan 21 window sits half-counted
    * in RocksDB state. Batch 2 and the flush sentinel are written
    * AFTER run 1 has fully terminated, so run 2 (same checkpoint, same
    * sink) can only produce the correct Jan 21 count by recovering
    * run 1's state from the checkpoint — the restart is load-bearing
    * for the hash, not incidental. Exactly-once across the restart
    * comes from the production mechanisms themselves: source progress
    * from the offset log, state from RocksDB changelog checkpoints,
    * sink atomicity from the file sink's _spark_metadata transaction
    * log (which the read-back honors). A re-read of consumed batches
    * would double counts; lost state would shrink them; either flips
    * the hash.
    *
    * Scale design: identical to s01/s33 (one windowed streaming agg,
    * bounded open-window state); the recovery adds no data-sized work
    * — checkpoint replay is O(state), not O(history). */
  def streamRestartRecovery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val outStr = cachedScratchDir(restartDirs, sfDir, "events.parquet") {
      val in = newTempDir("graft_s40_in")
      val out = newTempDir("graft_s40_out")
      val ck = newTempDir("graft_ckpt_s40")
      val ev = graft.Tables.events(spark, sfDir)
        .select($"ts", $"event_type", $"value")
      val cut1 = to_timestamp(lit("2024-01-11 07:00:00"))
      val cut2 = to_timestamp(lit("2024-01-21 13:00:00"))
      writeChangelogFile(ev.filter($"ts" < cut1), in, 0)
      writeChangelogFile(ev.filter($"ts" >= cut1 && $"ts" < cut2), in, 1)
      val firstLeg = runRestartLeg(spark, in, out, ck)   // ← the "kill"
      // files that did not exist during run 1: the tail of the data and
      // the watermark-flush sentinel (one per type, see eventsStreamWithFlush)
      writeChangelogFile(ev.filter($"ts" >= cut2), in, 2)
      writeChangelogFile(
        ev.select($"event_type").distinct()
          .withColumn("ts",
            to_timestamp(lit("2100-01-01 00:00:00")))
          .withColumn("value", lit(0.0))
          .select($"ts", $"event_type", $"value"), in, 3)
      val secondLeg = runRestartLeg(spark, in, out, ck)  // ← the restart
      // continuity proof: run 2 resumed the checkpoint (batchIds carry
      // on past run 1's) rather than starting a fresh query at 0 — a
      // fresh start would also double-process and flip the hash, but
      // fail loudly here instead of at the oracle compare
      require(firstLeg >= 0 && secondLeg > firstLeg,
        s"s40: restart did not resume from checkpoint " +
          s"(run1 terminal batchId $firstLeg, run2 $secondLeg)")
      out.toString
    }
    spark.read.parquet(outStr)
      .orderBy($"w_start", $"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s40_restart_recovery" -> streamRestartRecovery _,
    "s41_foreach_exactly_once" -> streamForeachExactlyOnce _,
    "s42_queryable_state" -> streamQueryableState _,
    "s43_state_bootstrap" -> streamStateBootstrap _,
    "s44_state_evolution" -> streamStateEvolution _,
    "s45_stream_sliding_mau" -> streamSlidingMau _,
    "s46_stream_binned_median" -> streamBinnedMedian _,
    "s47_stream_embed_neardup" -> streamEmbedNearDup _,
    "s48_stream_serve_topk" -> streamServeTopK _,
    "s49_stream_count_min" -> streamCountMin _,
    "s35_foreach_counts" -> streamForeachCounts _,
    "s34_stream_ivf_assign" -> streamIvfAssign _,
    "s29_stream_index"    -> streamInvertedIndex _,
    "s01_stream_tumbling" -> streamTumbling _,
    "s02_stream_latest"   -> streamLatest _,
    "s03_stream_dedup"    -> streamDedup _,
    "s04_stream_hopping"  -> streamHopping _,
    "s05_stream_join"     -> streamViewPurchase _,
    "s06_stream_left_join" -> streamViewPurchaseLeft _,
    "s07_fk_join_batch"   -> fkJoinBatch _,
    "s08_stream_dim_enrich" -> streamDimEnrich _,
    "s09_stream_sessions" -> streamSessionWindows _,
    "s10_fk_changelog_stream" -> streamFkChangelog _,
    "s11_stream_distinct" -> streamDistinctUsers _,
    "s12_stream_cogroup"  -> streamCogroup _,
    "s13_stream_outer_join" -> streamViewPurchaseOuter _,
    "s14_stream_table_join" -> streamTableJoin _,
    "s15_stream_table_update" -> streamTableUpdateJoin _,
    "s16_stream_range_join" -> streamRangeJoin _,
    "s17_stream_salted_agg" -> streamSaltedAgg _,
    "s18_stream_topn"       -> streamTopN _,
    "s19_stream_quarantine" -> streamCorruptQuarantine _,
    "s20_stream_merge"      -> streamMerge _,
    "s21_stream_pipeline"   -> streamPipeline _,
    "s22_fmgws_sessions"    -> streamFmgwsSessions _,
    "s23_bounded_trigger"   -> streamBoundedTrigger _,
    "s24_stream_neardup"    -> streamNearDup _,
    "s25_stream_asof"       -> streamAsOfJoin _,
    "s26_stream_novelty"    -> streamNovelty _,
    "s27_stream_semi_join"  -> streamViewPurchaseSemi _,
    "s28_stream_dyn_sessions" -> streamDynamicSessions _,
    "s30_stream_anomaly"    -> streamRollingAnomaly _,
    "s31_stream_cusum"      -> streamCusum _,
    "s32_timer_sessions"    -> streamTimerSessions _,
    "s33_sink_roundtrip"    -> streamSinkRoundtrip _,
    "s36_stream_funnel"     -> streamFunnel _,
    "s37_stream_attribution" -> streamAttribution _,
    "s38_late_data"         -> streamLateData _,
    "s39_stream_cdc"        -> streamCdcDiff _,
  )

  private val tumblingOracle =
    """SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS w_start,
      |event_type, count(*) AS n,
      |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    // the e44 batch oracle verbatim: incremental funnel assembly across
    // the three time-partitioned batches must equal the whole-month
    // window-chain result
    "s36_stream_funnel" ->
      graft.operators.Events.oracles("e44_funnel_stages"),
    // the e47 batch oracle verbatim: incremental latest-click state
    // across the three time-partitioned batches must equal the
    // whole-month LOCF window
    "s37_stream_attribution" ->
      graft.operators.Events.oracles("e47_attribution"),
    // the d49 oracle minus the removed row — arrival-side CDC cannot
    // see keys that never re-appear; split-rule literals interpolate
    // from the same Scala constants as the batch oracle
    "s39_stream_cdc" -> {
      val T = graft.operators.TextOps
      s"""WITH d AS (SELECT doc_id AS k, text,
         |    CAST(n_chars AS BIGINT) AS n_chars FROM documents),
         |o AS (SELECT k, md5(text) AS old_h, n_chars AS old_chars FROM d
         |  WHERE k % ${T.SnapOldMod} <> ${T.SnapOldMod - 1}),
         |n AS (SELECT k,
         |    md5(CASE WHEN k % ${T.SnapEditMod} = 0 THEN text || ' v2'
         |      ELSE text END) AS new_h,
         |    CASE WHEN k % ${T.SnapEditMod} = 0 THEN n_chars + 3
         |      ELSE n_chars END AS new_chars
         |  FROM d WHERE k % ${T.SnapNewMod} <> ${T.SnapNewMod - 1}),
         |j AS (SELECT n.k, old_h, new_h, old_chars, new_chars,
         |    CASE WHEN old_h IS NULL THEN 'added'
         |      WHEN old_h = new_h THEN 'unchanged'
         |      ELSE 'changed' END AS status
         |  FROM n LEFT JOIN o ON o.k = n.k)
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(COALESCE(new_chars, 0)) AS BIGINT) AS new_chars,
         |  CAST(sum(COALESCE(old_chars, 0)) AS BIGINT) AS old_chars,
         |  CAST(min(k) AS BIGINT) AS min_key
         |FROM j GROUP BY status ORDER BY status""".stripMargin
    },
    // the empirically-pinned drop rule replayed relationally: batch =
    // event_id % 3, watermark_b = running max event time of PRIOR
    // batches − 2 days, keep iff daily window END > watermark
    "s38_late_data" ->
      """WITH e AS (SELECT event_id % 3 AS b, epoch_us(ts) AS tus,
        |    event_type FROM events),
        |mx AS (SELECT b, max(tus) AS mts FROM e GROUP BY b),
        |wm AS (SELECT b, max(mts) OVER (ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
        |    - 2 * 86400000000 AS wm_us FROM mx),
        |fin AS (SELECT max(tus) - 2 * 86400000000 AS fwm FROM e),
        |k AS (SELECT e.tus, e.event_type FROM e JOIN wm USING (b)
        |  WHERE wm.wm_us IS NULL
        |    OR ((e.tus // 86400000000) + 1) * 86400000000 > wm.wm_us)
        |SELECT make_timestamp((tus // 86400000000) * 86400000000) AS w_start,
        |  event_type, count(*) AS n
        |FROM k CROSS JOIN fin
        |WHERE ((tus // 86400000000) + 1) * 86400000000 <= fin.fwm
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    // the side-effect store must reconstruct the full per-type
    // aggregate: counts + the Det.dsum decimal-sum contract
    "s35_foreach_counts" ->
      """SELECT event_type, count(*) AS n,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |  AS sum_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // s35's contract under a FORCED duplicate batch delivery: the
    // batchId-idempotent store must absorb the replay, so the rebuilt
    // aggregate still equals the whole-table truth
    "s41_foreach_exactly_once" ->
      """SELECT event_type, count(*) AS n,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |  AS sum_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // shares v07's index-definition CTE text + cosine fragment; the
    // centroid round(c, 6) is the v09 Lloyd determinism contract
    "s34_stream_ivf_assign" -> {
      val V = graft.operators.VectorOps
      val c = V.cosFragment("e.v", "cvr.cvv")
      s"""WITH ${V.ivfCentCte},
         |cvr AS (SELECT c_label, list(round(c, 6) ORDER BY i) AS cvv
         |  FROM cent GROUP BY 1),
         |ac AS (SELECT e.vec_id, cvr.c_label, $c AS ccos,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY $c DESC, cvr.c_label) AS rn
         |  FROM e CROSS JOIN cvr)
         |SELECT vec_id, c_label AS cell, round(ccos, 6) AS ccos
         |FROM ac WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },
    // the e39 batch oracle verbatim: streaming incremental assembly of
    // the trailing-20 window must reproduce the batch window sort
    "s30_stream_anomaly" ->
      graft.operators.Events.oracles("e39_rolling_anomaly"),
    // the e04 batch oracle verbatim: timer-closed sessions must equal
    // the retrospective gaps-and-islands result (s09/s22's contract)
    "s32_timer_sessions" ->
      graft.operators.Events.oracles("e04_session_windows"),
    // fixed-baseline CUSUM via the same prefix-sum identity as e41's
    // oracle, restricted to the monitor window; c goes HUGEINT mid-CTE,
    // the output is r4's DOUBLE (the d29/d30 lesson)
    "s31_stream_cusum" ->
      s"""WITH base AS (SELECT user_id, count(*) AS n0,
         |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS s0
         |  FROM events WHERE ts < TIMESTAMP '$CusumCut'
         |  GROUP BY user_id),
         |mon AS (SELECT e.user_id, e.ts, e.event_id,
         |    CAST(round(e.value * 100, 0) AS BIGINT) AS cents, b.n0, b.s0
         |  FROM events e JOIN base b ON b.user_id = e.user_id
         |  WHERE e.ts >= TIMESTAMP '$CusumCut'),
         |p AS (SELECT user_id, ts, event_id, n0,
         |    sum(n0 * cents - s0) OVER win AS p
         |  FROM mon
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING)),
         |cu AS (SELECT user_id, ts, event_id, n0,
         |    p - least(0, min(p) OVER win) AS c
         |  FROM p
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING)),
         |r AS (SELECT user_id, ts, event_id, n0, c,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY c DESC, ts, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n_mon
         |  FROM cu)
         |SELECT user_id, n0 AS n_base, n_mon,
         |  ${graft.functions.Det.sql.r4("c", "n0 * 100")} AS cusum_max,
         |  ts AS cp_ts, event_id AS cp_event_id
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // the d37 top-CTE truth (no postings): the streamed index snapshot
    // must equal the whole-corpus batch computation
    "s29_stream_index" ->
      """WITH tf AS (SELECT term, doc_id, count(*) AS tf FROM
        |  (SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |   FROM documents) GROUP BY term, doc_id)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
        |FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 50""".stripMargin,
    // e33's oracle text verbatim: streaming assembly must equal batch
    "s28_stream_dyn_sessions" ->
      graft.operators.Events.oracles("e33_dynamic_sessions"),
    // streaming EXISTS: views with at least one purchase in-window
    "s27_stream_semi_join" ->
      """SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts
        |FROM events v
        |WHERE v.event_type = 'view' AND EXISTS (
        |  SELECT 1 FROM events p WHERE p.event_type = 'purchase'
        |    AND p.user_id = v.user_id AND p.ts >= v.ts
        |    AND p.ts <= v.ts + INTERVAL 60 MINUTE)
        |ORDER BY view_id""".stripMargin,
    // d30's shingle CTE text, odd docs probing the even-doc vocabulary
    "s26_stream_novelty" ->
      """WITH t0 AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |tok AS (SELECT doc_id, unnest(list_distinct([toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]
        |  for g in range(1, len(toks) - 1)])) AS s FROM t0),
        |old AS (SELECT DISTINCT s FROM tok WHERE doc_id % 2 = 0)
        |SELECT t.doc_id, count(*) AS n_grams,
        |  count(*) - count(o.s) AS n_novel,
        |(((count(*) - count(o.s)) * 20000 + count(*)) // (count(*) * 2)) / 10000.0
        |  AS novelty
        |FROM tok t LEFT JOIN old o ON o.s = t.s
        |WHERE t.doc_id % 2 = 1 GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // left-outer as-of: latest view at-or-before each purchase, per user
    "s25_stream_asof" ->
      """WITH q AS (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'view'),
        |t AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT t.event_id AS trade_id, t.user_id, t.ts AS trade_ts,
        |  q.ts AS quote_ts, q.value AS quote_value,
        |  row_number() OVER (PARTITION BY t.event_id
        |    ORDER BY q.ts DESC, q.event_id DESC) AS rn
        |  FROM t LEFT JOIN q ON q.user_id = t.user_id AND q.ts <= t.ts)
        |SELECT trade_id, user_id, trade_ts, quote_ts, quote_value
        |FROM j WHERE rn = 1 ORDER BY trade_id""".stripMargin,
    // the d06 band CTE (shared text), odd docs probing even-doc buckets
    "s24_stream_neardup" ->
      s"""WITH ${graft.operators.TextOps.mhBandsCte},
         |old AS (SELECT band, bh, min(doc_id) AS min_old FROM bands
         |  WHERE doc_id % 2 = 0 GROUP BY band, bh),
         |nw AS (SELECT b.doc_id, o.min_old FROM bands b
         |  JOIN old o ON b.band = o.band AND b.bh = o.bh
         |  WHERE b.doc_id % 2 = 1)
         |SELECT doc_id AS new_doc, min(min_old) AS dup_of,
         |  count(*) AS matched_bands
         |FROM nw GROUP BY doc_id ORDER BY new_doc""".stripMargin,
    // v30's oracle VERBATIM: the streamed-ingest index must serve the
    // batch truth (see streamServeTopK's scaladoc)
    "s48_stream_serve_topk" ->
      graft.operators.VectorOps.retrievalPipelineSql,
    // x05's oracle VERBATIM: the streamed CMS must serve the batch
    // truth (see streamCountMin's scaladoc)
    "s49_stream_count_min" ->
      graft.operators.Extras.countMinSql,
    // v08's band CTE (shared text), odd vecs probing even-vec buckets;
    // candidates are the per-bucket min corpus vec (the s24 contract),
    // then exact-cosine verified at v08's threshold
    "s47_stream_embed_neardup" ->
      s"""WITH ${graft.operators.VectorOps.lshBandsCteSql},
         |old AS (SELECT b, code, min(vec_id) AS min_old FROM bands
         |  WHERE vec_id % 2 = 0 GROUP BY b, code),
         |cand AS (SELECT DISTINCT o.min_old AS d1, nb.vec_id AS d2
         |  FROM bands nb JOIN old o ON nb.b = o.b AND nb.code = o.code
         |  WHERE nb.vec_id % 2 = 1)
         |SELECT d1, d2,
         |  round(${graft.operators.VectorOps.cos("ea.v", "eb.v")}, 6) AS cos
         |FROM cand JOIN e ea ON ea.vec_id = d1 JOIN e eb ON eb.vec_id = d2
         |WHERE ${graft.operators.VectorOps.cos("ea.v", "eb.v")} >= 0.4
         |ORDER BY d1, d2""".stripMargin,
    // parquet side contributes every row, JSON side all non-corrupt rows
    "s20_stream_merge" ->
      """SELECT event_type,
        |count(*) + count(*) FILTER (WHERE event_id % 97 <> 0) AS n,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4)))
        |  + sum(CASE WHEN event_id % 97 <> 0 THEN CAST(value AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same arithmetic as e26's batch oracle — the stream must quarantine
    // exactly the rows the batch parser does
    "s19_stream_quarantine" ->
      """SELECT coalesce(CASE WHEN event_id % 97 = 0 THEN NULL
        |  ELSE event_type END, '_corrupt') AS bucket,
        |count(*) AS n,
        |count(*) FILTER (WHERE event_id % 97 = 0) AS n_corrupt,
        |round(CAST(sum(CASE WHEN event_id % 97 = 0
        |  THEN CAST(0 AS DECIMAL(18,4))
        |  ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "s18_stream_topn" ->
      """SELECT event_type, rank, event_id, round(value, 2) AS value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rank
        |  FROM events) t
        |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "s17_stream_salted_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS w_start,
        |event_type, count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "s16_stream_range_join" ->
      """WITH promos AS (SELECT p AS promo_id,
        |  TIMESTAMP '2024-01-01 06:00:00' + (p*3) * INTERVAL 1 DAY AS p_start,
        |  TIMESTAMP '2024-01-01 06:00:00' + (p*3) * INTERVAL 1 DAY
        |    + INTERVAL 36 HOUR AS p_end
        |  FROM (SELECT unnest(range(10)) AS p))
        |SELECT event_id, promo_id, user_id, round(value, 2) AS value
        |FROM events e JOIN promos
        |  ON epoch_us(e.ts) >= epoch_us(p_start)
        |  AND epoch_us(e.ts) < epoch_us(p_end)
        |ORDER BY event_id, promo_id""".stripMargin,
    "s11_stream_distinct" ->
      """SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS w_start,
        |count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "s12_stream_cogroup" ->
      """SELECT user_id,
        |count(*) FILTER (WHERE event_type = 'view') AS n_views,
        |count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
        |count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4)))
        |  FILTER (WHERE event_type = 'purchase') AS DOUBLE), 2) AS purchase_value
        |FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s23_bounded_trigger" ->
      """SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
        |  AS w_start, count(*) AS n,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |  AS sum_value
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    // e04's gaps-and-islands session SQL minus the value sum (the
    // custom state machine tracks (start, end, count) per session)
    "s22_fmgws_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      >= INTERVAL 2 HOUR THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 2 HOUR AS s_end,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
    // dedup is a no-op on the fixture (unique event_ids) but exercises
    // the chained state store; the oracle is the batch equivalent of
    // the whole filter→enrich→window chain
    "s21_stream_pipeline" ->
      """SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
        |  AS w_start, n_name, count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |  AS sum_value
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |WHERE event_type IN ('view', 'click', 'purchase')
        |GROUP BY 1, 2 ORDER BY w_start, n_name""".stripMargin,
    "s01_stream_tumbling" -> tumblingOracle,
    // the same tumbling contract, but the execution provably crosses a
    // checkpoint restart: run 1 consumes a time-ordered prefix and
    // terminates, run 2 restarts from the checkpoint and finishes; the
    // mid-day batch cuts make the recovered window state load-bearing
    "s40_restart_recovery" -> tumblingOracle,
    // the same tumbling contract, but the result ARRIVES through a real
    // file sink (writeStream.format("parquet")) and is read back from
    // the sink's output files — the to(topic)/sink row of §2 under the
    // hash gate, not just a spec
    "s33_sink_roundtrip" -> tumblingOracle,
    "s02_stream_latest" ->
      """SELECT user_id, event_id, ts, event_type, round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // the same latest-by-key truth, but the rows come from an
    // OUT-OF-BAND read of the terminated query's RocksDB store via the
    // state data source (Interactive Queries): a stale or lossy store
    // diverges from the batch changelog reduction
    "s42_queryable_state" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // the warm-start identity: snapshot(first half) folded with
    // increments(second half) must equal the full-replay per-user
    // totals — additive, so a lost/duplicated snapshot row flips the
    // hash on that key
    "s43_state_bootstrap" ->
      """SELECT user_id, count(*) AS n_events,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the rolling-upgrade identity: v1 state (first half) reinterpreted
    // by the widened v2 schema + v2 increments (second half) ≡ full
    // counts with the new metric counted from the upgrade instant only
    "s44_state_evolution" ->
      """SELECT user_id, count(*) AS n_events,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
        |CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 09:30:00'
        |  THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT) AS cents_new
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // e54's median half verbatim (bins → cumsum → type-1 read-off with
    // intra-bin interpolation): the streamed monoid bins must reproduce
    // the batch formula exactly
    "s46_stream_binned_median" ->
      s"""WITH j AS (SELECT event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
        |b1 AS (SELECT event_type,
        |    c // ${graft.operators.Events.MadBinCents} AS bin,
        |    CAST(count(*) AS BIGINT) AS bc FROM j GROUP BY 1, 2),
        |c1 AS (SELECT event_type, bin, bc,
        |    sum(bc) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(bc) OVER (PARTITION BY event_type) AS n FROM b1),
        |m AS (SELECT event_type, CAST(n AS BIGINT) AS n,
        |    bin * ${graft.operators.Events.MadBinCents}
        |      + ((((n+1)//2) - (cum - bc))
        |      * ${graft.operators.Events.MadBinCents}) // bc AS mc
        |  FROM c1 WHERE cum >= (n+1)//2 AND cum - bc < (n+1)//2)
        |SELECT event_type, n,
        |  ${graft.functions.Det.sql.r4("mc", "100")} AS approx_median
        |FROM m ORDER BY event_type""".stripMargin,
    // e51's mau7 columns: trailing-7-day distinct users for each day
    // with activity (DATE + integer = DATE in DuckDB)
    "s45_stream_sliding_mau" ->
      """WITH p AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
        |    user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM p),
        |x AS (SELECT dd.day, p.user_id
        |  FROM p JOIN days dd ON dd.day BETWEEN p.d AND p.d + 6)
        |SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau7
        |FROM x GROUP BY day ORDER BY day""".stripMargin,
    "s03_stream_dedup" ->
      """SELECT event_id, user_id, ts, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "s04_stream_hopping" ->
      """WITH hopped AS (
        |  SELECT make_timestamp(((epoch_us(ts) // (1800*1000000)) - k) * 1800*1000000) AS w_start,
        |    event_type
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT w_start, event_type, count(*) AS n
        |FROM hopped GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "s05_stream_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
        |round(p.value, 2) AS purchase_value
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
        |ORDER BY view_id, purchase_id""".stripMargin,
    "s06_stream_left_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
        |round(p.value, 2) AS purchase_value
        |FROM events v LEFT JOIN events p ON v.user_id = p.user_id
        |AND p.event_type = 'purchase'
        |AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
        |WHERE v.event_type = 'view'
        |ORDER BY view_id, purchase_id NULLS FIRST""".stripMargin,
    "s13_stream_outer_join" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts FROM events
        |  WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts,
        |  value FROM events WHERE event_type = 'purchase')
        |SELECT v.view_id, p.purchase_id,
        |coalesce(v.user_id, p.p_user) AS user_id,
        |round(p.value, 2) AS purchase_value
        |FROM v FULL JOIN p ON v.user_id = p.p_user
        |AND p.p_ts >= v.ts AND p.p_ts <= v.ts + INTERVAL 60 MINUTE
        |ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin,
    "s15_stream_table_update" ->
      """SELECT event_id, user_id, event_type,
        |CASE WHEN event_id % 2 = 0 THEN 'OLD_' || n_name ELSE n_name END
        |  AS dim_name
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |ORDER BY event_id""".stripMargin,
    "s14_stream_table_join" ->
      """WITH latest AS (SELECT user_id, event_type AS last_type,
        |  round(value, 2) AS last_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |  WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.event_type, l.last_type, l.last_value
        |FROM events e JOIN latest l USING (user_id)
        |ORDER BY event_id""".stripMargin,
    "s07_fk_join_batch" ->
      """SELECT c_custkey AS left_key, CAST(c_nationkey AS BIGINT) AS fk,
        |c_name AS left_val, n_name AS right_val
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY left_key""".stripMargin,
    "s08_stream_dim_enrich" ->
      """SELECT event_id, user_id, n_name, round(value, 2) AS value
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |ORDER BY event_id""".stripMargin,
    "s09_stream_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      >= INTERVAL 2 HOUR THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 2 HOUR AS s_end,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
    "s10_fk_changelog_stream" ->
      """SELECT c_custkey AS left_key, CAST(c_nationkey AS BIGINT) AS fk,
        |c_name AS left_val,
        |unnest(['OLD_' || n_name, n_name]) AS right_val
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY left_key, right_val""".stripMargin,
  )
}
