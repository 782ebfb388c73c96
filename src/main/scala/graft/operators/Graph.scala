package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the dedup operators. */
object Graph {

  /** Connected components over an undirected pair list `(d1, d2)` via
    * iterative min-label propagation (the Pregel pattern on
    * DataFrames). Returns one row per node: `(id, cluster_id)` where
    * cluster_id = the component's minimum node id — the representative
    * a dedup pass would keep.
    *
    * Scale design: each iteration is one neighbor-min aggregation plus
    * a pointer-jumping step (label ← label of label), which halves the
    * remaining component depth — convergence in O(log diameter)
    * rounds. The label table is bounded by the candidate-pair node set
    * (small by construction for LSH dedup graphs), so the
    * per-iteration joins broadcast it — but ONLY below
    * `broadcastNodeLimit` nodes: an unconditional hint on a general
    * graph is a driver OOM at scale, so past the limit the hint is
    * dropped and AQE picks the join strategy from runtime stats
    * (shuffled hash joins; same convergence, one exchange per side per
    * round). The node count is read off the already-materialized label
    * checkpoint, so the decision costs no extra pass.
    * localCheckpoint (not persist) truncates the
    * loop's lineage so iteration N doesn't recompute iterations
    * 0..N−1. Labels only ever decrease, so sum(label) is a
    * strictly-monotone convergence witness — one scalar aggregate per
    * round instead of an anti-join change detector. */
  // Why a hand-rolled loop and not Spark 4's WITH RECURSIVE (which q22
  // uses for tree rollups): recursive CTEs support only UNION ALL, and
  // a transitive closure over an UNDIRECTED edge set cycles through its
  // 2-cycles — unbounded row growth with no dedup. Min-label
  // propagation converges in O(log diameter) rounds instead.
  private[graft] def connectedComponents(pairs: DataFrame,
      broadcastNodeLimit: Long = 5000000L): DataFrame = {
    val edges = pairs.toDF("d1", "d2")
      .union(pairs.toDF("d1", "d2").select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint()
    var labels = edges.select(col("d1").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // every small side inside the loop (labels / neighbor mins / parent
    // pointers) is bounded by the node count — one decision covers all
    val hint: DataFrame => DataFrame =
      if (labels.count() <= broadcastNodeLimit) broadcast else identity
    // sum() over zero rows is NULL: a corpus with no near-dup pairs is
    // legal input, so short-circuit before entering the loop.
    val sum0 = labels.agg(sum(col("label"))).collect()(0)
      .getAs[java.lang.Long](0)
    if (sum0 == null)
      return labels.select(col("id"), col("label").as("cluster_id"))
    var prevSum = sum0.longValue()
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      val neighborMin = edges
        .join(hint(labels), edges("d2") === labels("id"))
        .groupBy(edges("d1").as("id"))
        .agg(min(col("label")).as("nb_label"))
      val stepped = labels.join(hint(neighborMin), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nb_label"), col("label"))).as("l1"))
      val parents = stepped.select(col("id").as("p_id"), col("l1").as("p_label"))
      val next = stepped.join(hint(parents), col("l1") === col("p_id"), "left")
        .select(col("id"),
          least(col("l1"), coalesce(col("p_label"), col("l1"))).as("label"))
        .localCheckpoint()
      val newSum = next.agg(sum(col("label"))).collect()(0).getLong(0)
      converged = newSum == prevSum
      prevSum = newSum
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
