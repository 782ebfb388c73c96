package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway profiling harness (not part of the driver contract; deleted
// before commit).
object DevProfile {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    println(s"[prof] embeddings rows = ${e.count()}")

    // warm up codegen
    t("warmup full v08")(graft.operators.VectorOps.lshNearDup(spark, sfDir).count())

    // stage breakdown (fresh session-less rebuild each time)
    val bandCols = (0 until 8).map { b =>
      val bits = (0 until 8).map { k =>
        val j = b * 8 + k
        val arr = Array.tabulate(64) { g =>
          if (((g.toLong * 1103515245L + j * 12345L) / 65536L) % 2 == 0) 1.0 else -1.0
        }
        when(call_function("graft_dot", $"v", typedlit(arr)) >= 0d,
          "1").otherwise("0")
      }
      struct(lit(b.toLong).as("band"), concat(bits: _*).as("bh"))
    }
    val bands = e.select($"vec_id", $"v", explode(array(bandCols: _*)).as("x"))
      .select($"vec_id", $"x.band".as("band"), $"x.bh".as("bh"))
    t("bands only")(bands.count())
    t("bands forced (sum length bh)")(
      bands.agg(sum(length($"bh"))).collect())
    t("bands forced AGAIN")(
      bands.agg(sum(length($"bh"))).collect())
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
    cand.explain()
    println(s"[prof] raw candidates = ${t("cand join")(cand.count())}")
    t("cand join AGAIN")(cand.count())
    // bucket histogram: how hot are the hottest buckets?
    bands.groupBy($"band", $"bh").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(10).collect()
      .foreach(r => println(s"[prof] bucket band=${r.get(0)} bh=${r.get(1)} n=${r.get(2)}"))
    val nb = bands.groupBy($"band", $"bh").agg(count(lit(1)).as("n"))
      .agg(sum(expr("n*(n-1)/2")), count(lit(1))).collect()(0)
    println(s"[prof] theoretical pairs = ${nb.get(0)}, n_buckets = ${nb.get(1)}")
    val dist = cand.distinct()
    println(s"[prof] distinct candidates = ${t("cand distinct")(dist.count())}")
    val verified = dist
      .join(e.select($"vec_id".as("d1"), $"v".as("v1")), "d1")
      .join(e.select($"vec_id".as("d2"), $"v".as("v2")), "d2")
      .withColumn("cos", call_function("graft_cosine", $"v1", $"v2"))
      .filter($"cos" >= 0.4)
    println(s"[prof] verified pairs = ${t("verify joins")(verified.count())}")
    t("full v08 second call (cached)")(
      graft.operators.VectorOps.lshNearDup(spark, sfDir).count())
    spark.stop()
  }
}
