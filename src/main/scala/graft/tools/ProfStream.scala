package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: decompose the s-series fixed overhead. Each query runs
  * TWICE in-session at the given sf — the first run pays scratch-dir
  * builds + codegen, the second is the steady micro-batch machinery
  * (checkpoint init, batch planning, state-store load/commit, memory
  * sink). The second-run sum is the floor the round-5 brief's
  * "s-series ≤ ~28 s" target is about.
  *
  * Usage: runMain graft.tools.ProfStream [sfDir] [queryPrefix]
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val prefix = if (args.length > 1) args(1) else "s"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query micro-batch accounting: batches, and the listener's
    // durationMs breakdown (addBatch = actual work; the rest is
    // planning/walCommit/state machinery)
    val stats = new java.util.concurrent.ConcurrentHashMap[String,
      (Int, Long, Long)]()  // name -> (batches, addBatchMs, totalMs)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val add = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(0L)
          val tot = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
          stats.merge(p.name, (1, add, tot), (a, b) =>
            (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      })
    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
    // warmup on the smallest sf (codegen/JIT), like Bench
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    var sum1 = 0.0; var sum2 = 0.0
    picked.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once()
      stats.clear()
      val t2 = once()
      sum1 += t1; sum2 += t2
      // second run's listener rows (keyed by memory-sink query name)
      import scala.jdk.CollectionConverters._
      val rows = stats.asScala.toSeq.sortBy(_._1).map { case (q, (b, add, tot)) =>
        s"$q: $b batches, addBatch=${add}ms, trigger=${tot}ms"
      }.mkString("; ")
      println(f"PROF $name%-24s first=$t1%6.2f s  second=$t2%6.2f s  [$rows]")
    }
    println(f"PROF TOTAL first=$sum1%.1f s  second=$sum2%.1f s (${picked.size} queries)")
    spark.stop()
  }
}
