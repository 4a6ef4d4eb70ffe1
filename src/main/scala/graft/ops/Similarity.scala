package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the correctness baseline, and a sign-LSH
  * bucketed variant as the scale path (candidates meet only inside their
  * hyperplane-sign bucket — a keyed join, not a cross product; at cluster
  * scale the bucket column is also the repartition key).
  */
object Similarity {

  /** Cast float embedding to double for cross-engine-exact arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for the query subset. Window is
    * partitioned per query vector — parallel across queries.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("int").as("rk"), col("c_id"), col("cos"))
  }

  /** Axis-aligned sign-LSH bucket: bit j set iff v[j] > 0, j < nBits. */
  def signBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(j =>
      when(element_at(v, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** ANN: nearest neighbor within the same sign-LSH bucket. Recall < 1 by
    * construction (that's the ANN trade); at 100 TB the bucket key is the
    * shuffle/partition key and each bucket's candidate set is small.
    */
  def annBucketed(vecs: DataFrame, nBits: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .withColumn("bucket", signBucket(col("dv"), nBits))
    val a = v.select(col("bucket"), col("vec_id").as("q_id"), col("dv").as("qv"))
    val b = v.select(col("bucket"), col("vec_id").as("c_id"), col("dv").as("cv"))
    val scored = a.join(b, "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("bucket"), col("c_id").as("nn_id"), col("cos"))
  }

  /** Per-label centroid norm: posexplode → per-dimension mean → L2 norm.
    * (Also the IVF coarse-quantizer building block: centroids per partition.)
    */
  def labelCentroidNorms(vecs: DataFrame): DataFrame =
    vecs.select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"), count(lit(1)).as("n"))
      .groupBy("label").agg(
        round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
        max("n").as("n_vecs"))
}
