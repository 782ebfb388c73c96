package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev profiling runner (r15 optimization round): execute named queries
  * under the EXACT Bench session config, then walk the executed plan and
  * print every node with its runtime SQL metrics (rows, time-in-node,
  * spill, shuffle bytes) — the UI's SQL tab, on stdout, for a UI-less
  * sandbox. Warmup + median-of-reps timing mirrors Bench so numbers are
  * comparable. Not part of the harness. */
object ProfPlan {
  private def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
    val ms = p.metrics.collect {
      case (k, m) if m.value > 0 => s"$k=${m.value}"
    }.mkString(", ")
    out.append("  " * depth).append(p.nodeName)
      .append(if (ms.nonEmpty) s"  [$ms]" else "").append('\n')
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, out)
      case q: QueryStageExec        => walk(q.plan, depth + 1, out)
      case _ => p.children.foreach(walk(_, depth + 1, out))
    }
    p.subqueries.foreach { sq =>
      out.append("  " * (depth + 1)).append("SUBQUERY:\n")
      walk(sq, depth + 2, out)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup (scratch dirs, codegen, JIT)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // metrics of the LAST run's plan: execute the plan tree itself so
      // the SQLMetrics accumulate on the nodes we walk
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      plan.execute().count()
      val out = new StringBuilder
      walk(plan, 0, out)
      println(s"===== $n reps=${ts.map(t => f"$t%.3f").mkString("/")} =====")
      println(out.result())
    }
    spark.stop()
  }
}
