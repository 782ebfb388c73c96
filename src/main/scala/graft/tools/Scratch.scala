package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: run a named subset of SparkEntry.queries at a
  * given SF and show row counts + head rows. Not part of the harness. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
                else args.toSeq
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val rows = df.count()
        println(f"[scratch] $n%-26s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
        df.show(5, truncate = false)
      } catch { case e: Throwable =>
        println(s"[scratch] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
