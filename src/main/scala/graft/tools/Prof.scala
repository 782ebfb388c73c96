package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.TextOps.dupClusters(spark, "/root/testdata/sf0.001").count()
    // bench-like: d06 runs first (its caches are then shared by canonical plan)
    var t0 = System.nanoTime()
    graft.operators.TextOps.minhashLsh(spark, "/root/testdata/sf0.1").count()
    println(f"PROF d06: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    graft.operators.TextOps.dupClusters(spark, "/root/testdata/sf0.1").count()
    println(f"PROF d12: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
