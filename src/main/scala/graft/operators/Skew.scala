package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.GraftSession]]) handles most skew at runtime by
  * splitting oversized partitions. Explicit salting remains the tool when
  * one key dominates so badly that even a split partition's build side
  * must be replicated — e.g. joining 100 TB of events against per-user
  * dimensions where one user is 10% of traffic.
  *
  * `saltedJoin` replicates the small side `saltFactor` times (salt column
  * 0..saltFactor-1) and salts the big side randomly-but-deterministically
  * by hashing a tiebreak column, so each hot key spreads over
  * `saltFactor` reducers. Correct for inner/left joins on equality keys.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) from `tiebreak` (any column with
    * high cardinality within a key, e.g. an id). */
  def salt(tiebreak: Column, saltFactor: Int): Column =
    pmod(hash(tiebreak), lit(saltFactor))

  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      bigTiebreak: String, saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val saltedBig = big.withColumn("__salt", salt(col(bigTiebreak), saltFactor))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
