package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation tools for hot keys (a boilerplate shingle bucket, a
  * celebrity user_id, a dominant station). AQE's skew-join split handles
  * most cases at runtime; these are the explicit forms for when the skew is
  * known ahead of plan time.
  */
object Skew {

  /** Salted aggregation: two-phase groupBy. Phase 1 groups on
    * (key, salt ∈ [0,S)) so one hot key spreads over S reducers; phase 2
    * merges the S partials. Correct for any commutative re-aggregable pair
    * (partial, merge) — e.g. (count, sum), (sum, sum), (min, min).
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("n"))

  /** Salted join: replicate the small side S times (one copy per salt),
    * salt the big side's rows randomly-but-deterministically, join on
    * (key, salt). One hot key's rows land on S tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame =
    saltedJoin(big, small, Seq(key), salts)

  /** Composite-key form of [[saltedJoin]] — the LSH hot-bucket case, where
    * the join key is (band, band_key) and one viral span makes a single
    * bucket carry a large fraction of the corpus. Each big-side row takes
    * ONE deterministic-per-row salt, the replicated side covers all S
    * salts, so every matching pair still meets exactly once — result
    * identity with the plain join is the d22 gate.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
    val explodedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(explodedSmall, keys :+ "_salt").drop("_salt")
  }

  /** Isolate hot keys: split the frame into (hot, rest) by a key-frequency
    * threshold so the hot slice can take a broadcast/salted path while the
    * long tail uses the normal shuffled path.
    */
  def splitHotKeys(df: DataFrame, key: String, threshold: Long): (DataFrame, DataFrame) = {
    val hot = df.groupBy(key).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > threshold).select(key)
    (df.join(broadcast(hot), Seq(key), "left_semi"),
     df.join(broadcast(hot), Seq(key), "left_anti"))
  }
}
