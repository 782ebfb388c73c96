package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement of the IRREDUCIBLE AvailableNow micro-batch
  * machinery cost — the per-query floor every s-query pays before any
  * data-sized work (VERDICT r8 item 5). A no-op streaming query over a
  * ONE-ROW tmpfs parquet isolates: query planning + checkpoint dir
  * setup + offset/commit log writes + one micro-batch round trip +
  * memory-sink materialization. Three shapes, bracketing the s-series:
  *
  *   stateless       — passthrough to the memory sink (s34's shape)
  *   stateful-hdfs   — one-key count agg, default HDFS state store
  *                     (the windowed-agg s-queries)
  *   stateful-rocks  — the same agg under RocksDB + changelog
  *                     checkpointing (the transformWithState s-queries'
  *                     provider; RocksDB instance spin-up dominates)
  *
  * Usage: runMain graft.tools.StreamFloor [reps]  (default 5, median)
  * Not part of the harness; numbers recorded in SURVEY §6 so future
  * rounds can split machinery from regression at a glance. */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = graft.streaming.StreamOps.newTempDir("graft_floor")
    Seq(1).toDF("k").coalesce(1).write.mode("overwrite")
      .parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
    def src = spark.readStream.schema(schema).parquet(dir.toString)

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    var i = 0
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String)(body: Int => Unit): Unit = {
      i += 1; body(i) // untimed warmup: codegen + first checkpoint machinery
      val ts = (0 until reps).map { r => i += 1; time(body(i)) }
      println(f"[floor] $name%-16s median=${median(ts)}%6.3fs  " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    bench("stateless") { n =>
      graft.streaming.StreamOps.runToMemory(
        src, s"floor_sl_$n", "append", noDataBatch = false).count()
    }
    bench("stateful-hdfs") { n =>
      graft.streaming.StreamOps.runToMemory(
        src.groupBy($"k").count(), s"floor_sh_$n", "complete").count()
    }
    bench("stateful-rocks") { n =>
      graft.streaming.StreamOps.withRocksDb(spark) {
        graft.streaming.StreamOps.runToMemory(
          src.groupBy($"k").count(), s"floor_sr_$n", "complete").count()
      }
    }
    spark.stop()
  }
}
