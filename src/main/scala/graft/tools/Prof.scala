package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.TextOps.dupClusters(spark, "/root/testdata/sf0.001").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    time("d06")(graft.operators.TextOps.minhashLsh(spark, sf).count())
    time("d12")(graft.operators.TextOps.dupClusters(spark, sf).count())
    time("d08")(graft.operators.TextOps.ngramJaccard(spark, sf).count())
    spark.stop()
  }
}
