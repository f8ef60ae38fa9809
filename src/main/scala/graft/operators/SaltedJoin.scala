package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. aggregations keyed on a hot
  * value, or joins below AQE's skew thresholds that still straggle).
  *
  * The big (skewed) side gets a random-but-deterministic salt in
  * [0, salts); the small side is replicated once per salt value. The
  * join key becomes (key, salt), spreading each hot key over `salts`
  * reducers. Replication cost: small side x salts rows — keep `salts`
  * modest (8-32) and the small side genuinely small.
  */
object SaltedJoin {
  def join(big: DataFrame, small: DataFrame, key: String, salts: Int = 16,
           joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit every unmatched small-side row once
    // PER SALT REPLICA — only big-side-preserving join types are sound
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"salted join supports big-side-preserving join types only, got $joinType")
    // deterministic salt (hash of the whole row's key + a row hash) so
    // retried tasks salt identically
    val salted = big.withColumn("__salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)))
    val replicated = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
