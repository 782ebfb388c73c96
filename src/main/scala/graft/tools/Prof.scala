package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wd = "/root/testdata/sf0.001"
    val sfDir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, wd).count() catch { case _: Throwable => () }
    }
    val upTo = graft.SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 <= "d06_minhash_lsh")
    upTo.foreach { case (name, fn) =>
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
