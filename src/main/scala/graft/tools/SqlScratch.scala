package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: execute one ad-hoc SQL string against the fixture
  * tables (registered as temp views). Not part of the harness. */
object SqlScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "supplier", "customer", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("events")
    val df = spark.sql(args.mkString(" "))
    df.show(50, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
