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

    // staged breakdown of the ppjoin path (mirror of TextOps.ngramJaccard)
    def staged(sfd: String): Unit = {
      val t = 0.5
      val tok = graft.operators.TextOps.docsWithToks(spark, sfd)
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(0, size(toks)-3),
            g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
      time("  stage tok.count")(tok.count())
      val withDf = tok.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      val byDoc = withDf
        .groupBy($"doc_id").agg(
          sort_array(collect_list(struct($"df", $"h"))).as("sdh"))
        .select($"doc_id",
          size($"sdh").cast("long").as("n"),
          expr("array_sort(transform(sdh, x -> x.h))").as("hs"),
          expr(s"slice(sdh, 1, size(sdh) - cast(ceil(size(sdh) * $t) as int) + 1)")
            .as("pref"))
      val byDocC = time("  stage byDoc checkpoint")(byDoc.localCheckpoint())
      val prefix = byDocC.select($"doc_id", $"n",
          posexplode($"pref").as(Seq("r0", "x")))
        .select($"doc_id", $"n", $"x.h".as("h"), ($"r0" + 1).as("r"))
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
            least($"a.n" - $"a.r", $"b.n" - $"b.r") + 1 >=
              ceil(($"a.n" + $"b.n") * lit(t) / (1 + t)))
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(lit(1))
        .select($"d1", $"d2")
      time("  stage cand.count")(cand.count())
      val ver = cand
        .join(byDocC.select($"doc_id".as("d1"), $"hs".as("h1"), $"n".as("n1")), "d1")
        .join(byDocC.select($"doc_id".as("d2"), $"hs".as("h2"), $"n".as("n2")), "d2")
        .withColumn("common",
          call_function("graft_sorted_isect", $"h1", $"h2").cast("long"))
        .select($"d1", $"d2",
          round($"common" / ($"n1" + $"n2" - $"common").cast("double"), 4)
            .as("jaccard"))
        .filter($"jaccard" >= t)
        .orderBy($"d1", $"d2")
      time("  stage verify+sort")(ver.count())
      // variant: no candidate-dedup shuffle; dedup after verify
      val cand2 = prefix.as("a")
        .join(prefix.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
            least($"a.n" - $"a.r", $"b.n" - $"b.r") + 1 >=
              ceil(($"a.n" + $"b.n") * lit(t) / (1 + t)))
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      val ver2 = cand2
        .join(byDocC.select($"doc_id".as("d1"), $"hs".as("h1"), $"n".as("n1")), "d1")
        .join(byDocC.select($"doc_id".as("d2"), $"hs".as("h2"), $"n".as("n2")), "d2")
        .withColumn("common",
          call_function("graft_sorted_isect", $"h1", $"h2").cast("long"))
        .select($"d1", $"d2",
          round($"common" / ($"n1" + $"n2" - $"common").cast("double"), 4)
            .as("jaccard"))
        .filter($"jaccard" >= t)
        .dropDuplicates("d1", "d2")
        .orderBy($"d1", $"d2")
      time("  stage verify2 (late dedup)")(ver2.count())
    }

    graft.operators.TextOps.ngramJaccard(spark, "/root/testdata/sf0.001").count()
    direct("/root/testdata/sf0.001").count()
    staged(sfDir)
    staged(sfDir)

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
