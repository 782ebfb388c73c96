package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the d06 signature-build stages. Not part of the
  * harness. */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))

    time("read+count")(docs.count())
    time("read+count warm")(docs.count())

    val shingles = docs.repartition(8)
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          g -> concat_ws(' ', toks[g], toks[g+1], toks[g+2])))""")).as("s"))
    time("explode shingles count")(shingles.count())
    time("explode shingles count warm")(shingles.count())

    val withX = shingles.withColumn("x",
      expr("conv(substr(md5(s), 1, 8), 16, 10)").cast("long") % 2147483647L)
    time("+ md5/conv count")(withX.agg(sum($"x")).collect())
    time("+ md5/conv count warm")(withX.agg(sum($"x")).collect())

    val sig = withX.groupBy($"doc_id")
      .agg(array((0 until 16).map(i =>
        min((lit(graft.operators.TextOps.MhA(i)) * $"x" +
          lit(graft.operators.TextOps.MhB(i))) % 2147483647L)): _*).as("sig"))
    time("full sigs")(sig.count())
    time("full sigs warm")(sig.count())
    time("full sigs localCheckpoint")(sig.localCheckpoint().count())
    spark.stop()
  }
}
