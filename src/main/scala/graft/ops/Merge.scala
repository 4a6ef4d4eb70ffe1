package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 merge/upsert: apply a delta table to a snapshot by key. The
  * batch-engine form of `MERGE INTO` — the maintenance operation every
  * training-data pipeline runs between crawls (re-crawled documents replace
  * their previous versions, new documents append, untouched rows carry
  * forward).
  *
  * Scale shape: ONE full-outer equi-join on the key. With the snapshot and
  * delta bucketed on the key (ops/Bucketing, gated by j8) the join is
  * shuffle-free; an unbucketed small delta broadcasts under AQE. No window,
  * no skew sensitivity beyond the join itself (salt via ops/Skew if one key
  * dominates a crawl).
  */
object Merge {

  /** Upsert `updates` into `base` on `key`. Columns shared by both sides
    * take the update's value when present (COALESCE semantics — SCD1);
    * base-only columns carry forward (null for inserted rows); update-only
    * columns appear (null for kept rows). An `action` column records
    * updated / inserted / kept per row.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    // Presence markers, not key-null tests: a NULL key never matches in the
    // equi-join, so a base row with key=NULL would otherwise read as
    // "inserted" (b.key IS NULL on its own output row) and corrupt the
    // action audit. The markers are non-null exactly when the side is
    // present, whatever its key holds.
    val b = base.withColumn("_b_present", lit(true)).as("b")
    val u = updates.withColumn("_u_present", lit(true)).as("u")
    val shared = updates.columns.toSet - key
    val outBase = base.columns.filter(_ != key).map { c =>
      if (shared(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else col(s"b.$c").as(c)
    }
    val outNew = updates.columns.filter(c => c != key && !base.columns.contains(c))
      .map(c => col(s"u.$c").as(c))
    b.join(u, col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(Seq(coalesce(col(s"b.$key"), col(s"u.$key")).as(key)) ++
        outBase ++ outNew :+
        when(col("_b_present").isNotNull && col("_u_present").isNotNull, "updated")
          .when(col("_b_present").isNull, "inserted")
          .otherwise("kept").as("action"): _*)
  }
}
