package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the skewed (big) side into
  * `saltFactor` sub-keys and replicate the other side across all salts,
  * so one hot key's rows spread over `saltFactor` tasks instead of one
  * straggler.
  *
  * The salt must be deterministic for reproducible results: it's derived
  * from a hash of a row-identifying column, not `rand()`. At 100 TB you
  * would enable this selectively for keys flagged by AQE's skew stats
  * (`spark.sql.adaptive.skewJoin.*` handles sort-merge cases
  * automatically; explicit salting covers aggregations and the join
  * types AQE won't split). */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `bigKey === smallKey`, salting the big
    * side by `hash(idCol) % saltFactor` and exploding the small side
    * across every salt value. Result equals the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, idCol: Column, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(idCol), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
