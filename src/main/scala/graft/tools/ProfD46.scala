package graft.tools
import org.apache.spark.sql.SparkSession
object ProfD46 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", "/dev/shm/graft_sf100x/spill")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/dev/shm/graft_sf100x"
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    t("v08-pairs-100x")(graft.operators.VectorOps.lshNearDup(spark, sf).queryExecution.toRdd.count())
    t("v10-cc-cold")(graft.operators.VectorOps.embedDupClusters(spark, sf).queryExecution.toRdd.count())
    t("v10-cc-warm")(graft.operators.VectorOps.embedDupClusters(spark, sf).queryExecution.toRdd.count())
    spark.stop()
  }
}
