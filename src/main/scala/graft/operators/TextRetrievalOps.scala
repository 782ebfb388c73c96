package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det
import graft.functions.Det.r4

/** TextOps seam 4/5: RETRIEVAL — the inverted index build (d37) and
  * BM25 scoring/ranking (d28). */
trait TextRetrievalOps extends TextCoreOps {
  this: TextLshOps with TextStatsOps =>
  /** d37: inverted-index build — the retrieval-side artifact (d28 BM25
    * scores against exactly this structure): for the 50 highest-df
    * terms, the document frequency, total term frequency, and the
    * posting list capped to the 10 lowest doc_ids as "doc:tf" entries.
    *
    * Scale design: postings per term are UNBOUNDED at corpus scale, so
    * the cap is enforced BEFORE any list is collected — a row_number
    * window keyed on term keeps ≤ 10 rows per term, and only those
    * reach the bounded collect_list. df/tf totals come from a separate
    * map-side-combined hash-agg over the same tf table (never from the
    * capped rows), and the 50-term head is a LIMIT after one tiny agg —
    * production index builds shard postings by doc-range exactly this
    * way. */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = docsWithToks(spark, sfDir)
      .select($"doc_id", explode($"toks").as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val top = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("tf_total"))
      .orderBy(desc("df"), $"term").limit(50)
    val postings = tf
      .join(broadcast(top.select($"term")), "term")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"term").orderBy($"doc_id")))
      .filter($"rn" <= 10)
      .groupBy($"term")
      .agg(array_join(transform(
        sort_array(collect_list(struct($"doc_id", $"tf"))),
        x => concat(x("doc_id"), lit(":"), x("tf"))), ",").as("postings"))
    broadcast(top).join(postings, "term")
      .select($"term", $"df", $"tf_total", $"postings")
      .orderBy(desc("df"), $"term")
  }

  /** Fixed keyword workload for d28 — terms drawn from the fixture
    * vocabulary; a retrieval benchmark's query set is a bounded literal
    * input, never data-dependent. */
  private[graft] val Bm25Terms = Seq("spark", "join", "vector", "customer", "window")
  private[operators] val Bm25K1 = 1.2
  private[operators] val Bm25B = 0.75

  /** d28: BM25 keyword retrieval — top-5 documents per query term under
    * the Okapi BM25 ranking function (k1=1.2, b=0.75, the
    * Robertson/Sparck-Jones idf in its always-positive `ln(1 + …)`
    * form). The inverted-index scoring pass of a search engine,
    * expressed relationally: tf per (term, doc), df per term, doc
    * length vs corpus average for length normalization.
    *
    * Scale design: the term filter lands directly on the exploded token
    * stream, so only postings of the 5 query terms survive the first
    * hash-agg (at 100 TB: the posting lists, not the corpus, get
    * shuffled); doc lengths are a second map-side-combined hash-agg;
    * corpus totals (N, Σdl) and per-term df are single-row/5-row
    * broadcasts. Per-term top-5 is a window over ≤ df rows partitioned
    * by term — at scale the [[graft.functions.TopKAggregator]] bounded
    * buffer (v11) would replace the window; df here is fixture-small.
    *
    * Cross-engine determinism: tf, df, dl, N, Σdl are exact integers;
    * the score is a handful of double ops on those integers with
    * literal constants, rounded once to 1e-4 — same residual risk class
    * as d09/d16 (a value within 1 ulp of a rounding boundary could
    * differ; accepted there, accepted here). Rank ties break on doc_id
    * over the ROUNDED score, so both engines rank identically. */
  /** The BM25 scored table (doc_id, term, score) — shared by d28's
    * ranking and v17's retrieve-then-expand seed selection
    * ([[graft.operators.VectorOps]]); mirrors [[bm25Cte]]. */
  private[graft] def bm25Scored(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = docsWithToks(spark, sfDir)
    val dl = toks.select($"doc_id", size($"toks").cast("long").as("dl"))
    val totals = dl.agg(sum($"dl").as("sum_dl"),
      count(lit(1)).as("n_docs"))
    val tf = toks.select($"doc_id", explode($"toks").as("term"))
      .filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id")
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("score", round(
        $"idf" * ($"tf" * lit(Bm25K1 + 1.0)) /
          ($"tf" + lit(Bm25K1) * (lit(1.0 - Bm25B) +
            lit(Bm25B) * $"dl" * $"n_docs" / $"sum_dl")), 4))
  }

  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bm25Scored(spark, sfDir)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"term").orderBy(desc("score"), $"doc_id")))
      .filter($"rank" <= 5)
      .select($"term", $"rank".cast("long").as("rank"), $"doc_id", $"score")
      .orderBy($"term", $"rank")
  }
}
