package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables
import graft.functions.Det.dsum

/** Non-parquet file sources: JSON-lines and CSV read paths with explicit
  * schemas — the file-borne face of the serde surface (a Kafka topic's
  * JSON records land in object storage as exactly these JSON lines; CSV
  * is the interchange format every ingest pipeline still meets).
  *
  * Each declared query round-trips the events table through the format
  * once (written to scratch, mtime-cached per fixture like the streaming
  * flush source) and computes its aggregate FROM THE ROUND-TRIPPED COPY,
  * so what the oracle (running on the original parquet) verifies is the
  * serializer/parser fidelity itself: timestamps to the microsecond
  * (pinned by min/max epoch-µs in the output), doubles bit-exact
  * (shortest-roundtrip formatting), and CSV quoting of embedded JSON
  * (pinned by extracting a key from `props` post-roundtrip).
  *
  * Scale design: both readers are ordinary FileFormat scans — splittable
  * (JSON/CSV split by line), schema enforced up front (no inference
  * pass over 100 TB), pushdown-friendly column pruning. The explicit
  * `timestampFormat` keeps the parse on the fast DateTimeFormatter path
  * rather than the lenient fallback parser.
  */
object FileSources {

  /** Microsecond-precision wire format used for both write and read. */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val EventsDdl =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  // (sfDir, fmt) -> (fixture mtime, scratch dir); rebuilt if the fixture
  // is regenerated in place, deleted on JVM exit via StreamOps' hook
  private val dirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), (Long, String)]

  /** events → fmt on scratch (once per fixture) → read back with the
    * explicit schema. Columns are selected in schema order before the
    * write because CSV-with-schema binds by position, not header name. */
  private def roundTrip(spark: SparkSession, sfDir: String,
      fmt: String): DataFrame = {
    val srcMtime = new java.io.File(s"$sfDir/events.parquet").lastModified()
    val key = (sfDir, fmt)
    val cached = dirs.get(key).filter(_._1 == srcMtime)
    val dirStr = cached.map(_._2).getOrElse(dirs.updateWith(key) { _ =>
      Some((srcMtime, {
        val dir = graft.streaming.StreamOps.newTempDir(s"graft_src_$fmt")
        val w = Tables.events(spark, sfDir)
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").option("timestampFormat", TsFmt)
        fmt match {
          case "json" => w.json(dir.toString)
          case "csv"  => w.option("header", "true").csv(dir.toString)
        }
        dir.toString
      }))
    }.get._2)
    val r = spark.read.schema(StructType.fromDDL(EventsDdl))
      .option("timestampFormat", TsFmt)
    fmt match {
      case "json" => r.json(dirStr)
      case "csv"  => r.option("header", "true").csv(dirStr)
    }
  }

  /** Per-type profile computed from the JSON-lines round trip; min/max
    * epoch-µs pin microsecond timestamp fidelity into the hash. */
  def jsonSourceAgg(spark: SparkSession, sfDir: String): DataFrame =
    roundTrip(spark, sfDir, "json")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .orderBy(col("event_type"))

  /** Hour-of-day histogram from the CSV round trip; summing a key
    * extracted from the embedded-JSON `props` column proves the CSV
    * quoting of quotes/braces/commas survived the round trip. */
  def csvSourceAgg(spark: SparkSession, sfDir: String): DataFrame =
    roundTrip(spark, sfDir, "csv")
      .groupBy(hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy(col("hour"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e23_json_source" -> jsonSourceAgg _,
    "e24_csv_source"  -> csvSourceAgg _,
  )

  val oracles: Map[String, String] = Map(
    "e23_json_source" ->
      """SELECT event_type, count(*) AS n,
        |count(DISTINCT user_id) AS n_users,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value,
        |min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e24_csv_source" ->
      """SELECT CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n,
        |round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
  )
}
