package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TextOps, VectorOps}

/** End-to-end training-data curation pipeline — the capstone composition
  * a user of this library runs over a raw document corpus:
  *
  *   1. quality filter   (drop low-quality docs)
  *   2. normalization dedup (case/punct-only copies → canonical doc)
  *   3. exact dedup      (bag-of-words normalization, keep min doc_id)
  *   4. near-dup removal (MinHash+LSH dup CLUSTERS → keep each
  *      cluster's min-id representative, not just pairwise drops)
  *   5. tokenize + stats (token counts for the survivors)
  *
  * Every stage is a declarative DataFrame transform, so the whole
  * pipeline is ONE Catalyst plan per output: filters push into the scan,
  * the dedup anti-joins broadcast their (small) drop-lists, and nothing
  * materializes until the sink. At 100 TB each stage scales the same way
  * its standalone operator does (see TextOps scale notes).
  */
object TrainingDataPipeline {

  /** Returns the curated corpus: one row per surviving document with
    * token statistics attached. */
  def curate(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.5): DataFrame = {
    import spark.implicits._

    // 1. quality gate
    val quality = TextOps.qualityScore(spark, sfDir)
      .filter($"quality" >= minQuality)
      .select($"doc_id", $"quality", $"n_tokens")

    // 2. normalization dedup: canonical representative per normalized
    // fingerprint (case/punctuation-only copies collapse here, cheaper
    // than letting them reach the MinHash stage)
    val keepNorm = TextOps.normalizeDedup(spark, sfDir)
      .filter($"doc_id" === $"canonical_id")
      .select($"doc_id")

    // 3. exact dedup: representatives only
    val keepExact = TextOps.exactDedup(spark, sfDir)
      .select($"keep_id".as("doc_id"))

    // 4. near-dup clusters: keep each cluster's min-id representative
    // (pairwise "drop the higher id" under-deletes on chains A~B~C
    // where A≁C — the cluster view deletes every non-representative)
    val dropNear = TextOps.dupClusters(spark, sfDir)
      .filter($"doc_id" =!= $"cluster_id")
      .select($"doc_id")

    // compose: quality ∩ norm-canonical ∩ exact-representatives
    // ∖ near-dup-non-representatives
    val survivors = Tables.documents(spark, sfDir)
      .join(quality, "doc_id")
      .join(keepNorm, Seq("doc_id"), "left_semi")
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(broadcast(dropNear), Seq("doc_id"), "left_anti")

    survivors
      .select($"doc_id", $"lang", $"source", $"n_chars",
        round($"quality", 4).as("quality"), $"n_tokens")
      .orderBy($"doc_id")
  }

  /** Survivors enriched with an embedding (by doc_id ↔ vec_id at fixture
    * scale) and their cell assignment for downstream ANN dedupe. */
  def curateWithEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("doc_id"), $"embedding", $"label")
    curate(spark, sfDir).join(emb, Seq("doc_id"), "inner")
  }
}
