package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling main — NOT committed
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    org.apache.spark.sql.graft.VectorExpressions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // ---------- warmup (codegen compile) at tiny sf ----------
    val warm = "/root/testdata/sf0.001"
    graft.operators.VectorOps.lshNearDup(spark, warm).count()
    graft.operators.TextOps.ngramJaccard(spark, warm).count()

    // ---------- v08 stages at sfDir ----------
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
    println(s"[prof] embeddings rows = ${e.count()}")
    val bandCols = (0 until 8).map { b =>
      val bits = (0 until 8).map { k =>
        val j = b * 8 + k
        val md = java.security.MessageDigest.getInstance("MD5")
        val arr = Array.tabulate(64) { g =>
          val hex = md.digest(s"$g:$j".getBytes("UTF-8")); md.reset()
          if (((hex(0) >> 4) & 1) == 0) 1.0 else -1.0
        }
        when(call_function("graft_dot", $"v", typedlit(arr)) >= 0d, "1").otherwise("0")
      }
      struct(lit(b.toLong).as("band"), concat(bits: _*).as("bh"))
    }
    val bands = e.select($"vec_id", $"v", explode(array(bandCols: _*)).as("x"))
      .select($"vec_id", $"x.band".as("band"), $"x.bh".as("bh"))
    t("v08 bands")(bands.count())
    t("v08 bands forced")(bands.agg(sum(length($"bh"))).collect())
    t("v08 bands forced 2nd")(bands.agg(sum(length($"bh"))).collect())
    val bandsC = t("v08 bands checkpoint")(bands.localCheckpoint())
    val candC = bandsC.as("a")
      .join(bandsC.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
    println(s"[prof] raw candC = ${t("v08 cand join (ckpt bands)")(candC.count())}")
    t("v08 cand join (ckpt bands) 2nd")(candC.count())
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
    println(s"[prof] raw cand = ${t("v08 cand join")(cand.count())}")
    t("v08 cand join 2nd")(cand.count())
    t("v08 cand join 3rd")(cand.count())
    val dist = cand.distinct()
    println(s"[prof] dist cand = ${t("v08 distinct")(dist.count())}")
    val ver = dist
      .join(e.select($"vec_id".as("d1"), $"v".as("v1")), "d1")
      .join(e.select($"vec_id".as("d2"), $"v".as("v2")), "d2")
      .withColumn("cos", call_function("graft_cosine", $"v1", $"v2"))
      .filter($"cos" >= 0.4)
    println(s"[prof] verified = ${t("v08 verify joins")(ver.count())}")
    t("v08 full (fresh session cache)")(
      graft.operators.VectorOps.lshNearDup(spark, sfDir).count())
    t("v08 full again (cache hit)")(
      graft.operators.VectorOps.lshNearDup(spark, sfDir).count())

    // ---------- d08 stages ----------
    t("d08 full (first)")(graft.operators.TextOps.ngramJaccard(spark, sfDir).count())
    t("d08 full (second)")(graft.operators.TextOps.ngramJaccard(spark, sfDir).count())
    locally {
      import org.apache.spark.sql.expressions.Window
      val tk = 0.5
      val tok = Tables.documents(spark, sfDir)
        .select($"doc_id", split($"text", " ").as("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(0, size(toks)-3),
            g -> xxhash64(concat_ws(' ', toks[g], toks[g+1], toks[g+2]))))""")).as("h"))
      t("d08 tok")(tok.count())
      val withDf = tok.withColumn("df", count(lit(1)).over(Window.partitionBy($"h")))
      t("d08 withDf")(withDf.count())
      val byDoc = withDf
        .groupBy($"doc_id").agg(sort_array(collect_list(struct($"df", $"h"))).as("sdh"))
        .select($"doc_id", size($"sdh").cast("long").as("n"),
          expr("array_sort(transform(sdh, x -> x.h))").as("hs"),
          expr(s"slice(sdh, 1, size(sdh) - cast(ceil(size(sdh) * $tk) as int) + 1)").as("pref"))
      val byDocC = t("d08 byDoc checkpoint")(byDoc.localCheckpoint())
      val prefix = byDocC.select($"doc_id", $"n", posexplode($"pref").as(Seq("r0", "x")))
        .select($"doc_id", $"n", $"x.h".as("h"), ($"r0" + 1).as("r"))
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
            least($"a.n" - $"a.r", $"b.n" - $"b.r") + 1 >=
              ceil(($"a.n" + $"b.n") * lit(tk) / (1 + tk)))
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(lit(1)).select($"d1", $"d2")
      println(s"[prof] d08 cand = ${t("d08 prefix join")(cand.count())}")
      val ver = cand
        .join(byDocC.select($"doc_id".as("d1"), $"hs".as("h1"), $"n".as("n1")), "d1")
        .join(byDocC.select($"doc_id".as("d2"), $"hs".as("h2"), $"n".as("n2")), "d2")
        .withColumn("common", call_function("graft_sorted_isect", $"h1", $"h2").cast("long"))
      println(s"[prof] d08 ver = ${t("d08 verify joins")(ver.count())}")
    }
    spark.stop()
  }
}
