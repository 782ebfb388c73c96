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
    val sfDir = "/root/testdata/sf0.01"
    for (q <- Seq("q01_pricing_summary", "q02_region_revenue", "v01_cosine_topk", "e02_tumbling_daily")) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
