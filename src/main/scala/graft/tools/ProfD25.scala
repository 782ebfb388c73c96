package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfD25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    // warm
    graft.operators.TextOps.sharedSubstrings(spark, "/root/testdata/sf0.001").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = graft.Tables.documents(spark, sf).withColumn("toks", split(col("text"), " "))
    time("toks_only")(docs.select(col("doc_id"), size(col("toks")).as("n")).agg(sum(col("n"))).count())
    val w = docs.filter(size(col("toks")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, size(toks)-8),
           i -> xxhash64(concat_ws(' ', slice(toks, i+1, 8))))""")).as(Seq("pos", "h")))
    time("w_count")(w.count())
    time("w_agg")(w.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2).count())
    time("full")(graft.operators.TextOps.sharedSubstrings(spark, sf).count())
    time("full2")(graft.operators.TextOps.sharedSubstrings(spark, sf).count())
    spark.stop()
  }
}
