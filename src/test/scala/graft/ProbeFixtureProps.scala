package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the 100× probe fixture's replica transforms (VERDICT r13 item
  * 7). Before round 13 the embedding replicas were IDENTICAL copies,
  * which silently inflated every pair-emitting v-query's 100× probe by
  * the c² pair graph for four rounds — the probe measured the
  * degenerate pair list, not the plan. The fix (a per-replica sign
  * flip, an exact isometry) and the documents' token salt are now
  * factored into [[graft.tools.ScaleProbe100.embeddingReplica]] /
  * [[graft.tools.ScaleProbe100.documentReplica]] and THESE properties
  * run against those exact functions, so a future fixture edit cannot
  * reintroduce degenerate replication without failing the suite:
  *
  *  1. sign flip is an isometry: per-vector norms and all
  *     within-replica dot products are BIT-exact preserved (negation
  *     is exact in IEEE arithmetic);
  *  2. replicas are NOT mutual duplicates: mean |cosine| between a
  *     vector and its replica image collapses toward 0 (each replica
  *     keeps the base corpus's dup structure; cross-replica pairs add
  *     none);
  *  3. document replicas share no tokens (shingle spaces disjoint), so
  *     text dup DENSITY stays the base corpus's rather than dup
  *     MULTIPLICITY ×100.
  */
class ProbeFixtureProps extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private val dot = (a: String, b: String) =>
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * y), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  test("embedding replica sign flip is a bit-exact isometry " +
    "(norms and within-replica dot products preserved)") {
    val base = Tables.embeddings(spark, sf)
    val off = base.agg(max(col("vec_id"))).head.getLong(0) + 1L
    // within-replica pair (v, w) vs the same pair's replica-7 image:
    // self-join consecutive vec_ids so the pair structure is the base
    // corpus's, then compare dot products and norms EXACTLY
    def pairs(df: org.apache.spark.sql.DataFrame, shift: Long) = df
      .select((col("vec_id") - lit(shift)).as("k"), col("embedding"))
      .as("a")
      .join(df.select((col("vec_id") - lit(shift) - 1).as("k"),
        col("embedding").as("e2")).as("b"), "k")
      .select(col("k"), dot("embedding", "embedding").as("n2"),
        dot("embedding", "e2").as("d"))
    val rep = graft.tools.ScaleProbe100.embeddingReplica(base, 7, off)
    val drift = pairs(base, 0L).as("x")
      .join(pairs(rep, 7L * off).as("y"), "k")
      .filter(col("x.n2") =!= col("y.n2") || col("x.d") =!= col("y.d"))
      .count()
    assert(drift === 0L,
      s"$drift pairs changed norm or dot product under the sign flip")
  }

  test("cross-replica cosines collapse toward 0 (replicas are not dups)") {
    val base = Tables.embeddings(spark, sf).limit(200).cache()
    val off = base.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val rep = graft.tools.ScaleProbe100.embeddingReplica(base, 3, off)
      .select((col("vec_id") - lit(3L * off)).as("vec_id"),
        col("embedding").as("e2"))
    val stats = base.join(rep, "vec_id")
      .select((dot("embedding", "e2") /
        sqrt(dot("embedding", "embedding") * dot("e2", "e2"))).as("cos"))
      .agg(avg(abs(col("cos"))).as("mean_abs"), max(abs(col("cos"))).as("mx"))
      .head()
    val meanAbs = stats.getDouble(0)
    // identical replicas would give mean |cos| = 1.0 exactly; a random
    // sign flip over d dims concentrates around ~sqrt(2/(pi*d)). The
    // 0.5 fence is far from both the degenerate 1.0 and the expected
    // small value — it fails ONLY if replication degenerates again.
    assert(meanAbs < 0.5,
      f"mean |cosine(v, replica(v))| = $meanAbs%.3f — replicas are " +
        "near-duplicates; the pre-r13 degenerate fixture is back")
    base.unpersist()
  }

  test("document replicas share no tokens (shingle spaces disjoint)") {
    val base = Tables.documents(spark, sf)
    val off = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val shared = toks(graft.tools.ScaleProbe100.documentReplica(base, 1, off))
      .join(toks(graft.tools.ScaleProbe100.documentReplica(base, 2, off)),
        "tok")
      .count()
    assert(shared === 0L,
      s"$shared tokens shared between replica 1 and replica 2 — the " +
        "token salt no longer disjoins shingle spaces")
  }
}
