package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev experiment for the e38 hot loop (r15): isolate window cost vs
  * arithmetic cost vs round() cost. Not part of the harness. */
object ScratchE38 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val m = 8
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    def base: DataFrame = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", round($"value", 2).as("v"))
      .withColumn("pos", row_number().over(w).cast("long"))
    def slots(df: DataFrame): DataFrame = df
      .select(Seq($"user_id", $"pos", $"v".as("t1")) ++
        (2 to m).map(i => lead($"v", i - 1).over(w).as(s"t$i")): _*)
      .filter(col(s"t$m").isNotNull)
    val slotNames = (1 to m).map(i => s"t$i")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"E38X $name: ${ts.map(t => f"$t%.3f").mkString("/")}")
    }
    time("a_sort_only")(base.count())
    time("b_window_leads")(slots(base).count())
    val muE = s"round((${slotNames.mkString(" + ")}) / $m, 6)"
    val sdE = s"round(sqrt((${slotNames.map(t => s"($t - mu) * ($t - mu)")
      .mkString(" + ")}) / $m), 6)"
    time("c_mu_sd")(slots(base)
      .withColumn("mu", expr(muE)).withColumn("sd", expr(sdE))
      .filter($"sd" > 0).count())
    val muN = s"(${slotNames.mkString(" + ")}) / $m"
    val sdN = s"sqrt((${slotNames.map(t => s"($t - mu) * ($t - mu)")
      .mkString(" + ")}) / $m)"
    time("d_mu_sd_noround")(slots(base)
      .withColumn("mu", expr(muN)).withColumn("sd", expr(sdN))
      .filter($"sd" > 0).count())
    // full scoring with rounds
    val q = graft.operators.Events.SubqPattern
    val zE = slotNames.map(t => s"round(($t - mu) / sd, 6)")
    val distE = s"round(${(1 to m).map { i =>
      s"(z$i - ${q(i - 1)}) * (z$i - ${q(i - 1)})" }.mkString(" + ")}, 4)"
    time("e_full")(slots(base)
      .withColumn("mu", expr(muE)).withColumn("sd", expr(sdE))
      .filter($"sd" > 0)
      .select(Seq($"user_id", $"pos") ++
        zE.zipWithIndex.map { case (z, i) => expr(z).as(s"z${i + 1}") }: _*)
      .withColumn("dist", expr(distE))
      .select($"user_id", $"pos", $"dist",
        round($"dist" * 10000).cast("long").as("dist_micro"))
      .orderBy($"dist_micro", $"user_id", $"pos").limit(10).count())
    spark.stop()
  }
}
