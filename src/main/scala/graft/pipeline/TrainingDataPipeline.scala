package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TextOps, VectorOps}

/** End-to-end training-data curation pipeline — the capstone composition
  * a user of this library runs over a raw document corpus:
  *
  *   1. quality filter   (drop low-quality docs)
  *   2. exact dedup      (bag-of-words normalization, keep min doc_id)
  *   3. near-dup removal (MinHash+LSH pairs → drop the higher doc_id)
  *   4. tokenize + stats (token counts for the survivors)
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

    // 2. exact dedup: representatives only
    val keepExact = TextOps.exactDedup(spark, sfDir)
      .select($"keep_id".as("doc_id"))

    // 3. near-dup pairs: always drop the higher id of a pair
    val dropNear = TextOps.minhashLsh(spark, sfDir)
      .select($"d2".as("doc_id")).distinct()

    // compose: quality ∩ exact-representatives ∖ near-dup-drops
    val survivors = Tables.documents(spark, sfDir)
      .join(quality, "doc_id")
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
