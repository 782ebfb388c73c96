package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for d08 shapes. Not part of the harness. */
object ProfD08 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    org.apache.spark.sql.graft.VectorExpressions.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // direct count-join: one self-join on shingle hash + pair-count agg
    def direct(sfd: String): org.apache.spark.sql.DataFrame = {
      val t = 0.5
      val tok = graft.operators.TextOps.docsWithToks(spark, sfd)
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(0, size(toks)-3),
            g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
        .localCheckpoint()
      val n = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val common = tok.as("a").join(tok.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(count(lit(1)).as("common"))
      common
        .join(broadcast(n.select($"doc_id".as("d1"), $"n".as("n1"))), "d1")
        .join(broadcast(n.select($"doc_id".as("d2"), $"n".as("n2"))), "d2")
        .select($"d1", $"d2",
          round($"common" / ($"n1" + $"n2" - $"common").cast("double"), 4)
            .as("jaccard"))
        .filter($"jaccard" >= t)
        .orderBy($"d1", $"d2")
    }

    graft.operators.TextOps.ngramJaccard(spark, "/root/testdata/sf0.001").count()
    direct("/root/testdata/sf0.001").count()

    time("ppjoin d08")(graft.operators.TextOps.ngramJaccard(spark, sfDir).count())
    time("direct d08")(direct(sfDir).count())
    time("ppjoin d08 again")(graft.operators.TextOps.ngramJaccard(spark, sfDir).count())
    time("direct d08 again")(direct(sfDir).count())
    val a = graft.operators.TextOps.ngramJaccard(spark, sfDir)
    val b = direct(sfDir)
    println("[prof] diff rows: " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
