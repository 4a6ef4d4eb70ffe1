package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.engine.Caches.Registered

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
    graft.functions.DotProductExpr.column(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for the query subset. Window is
    * partitioned per query vector — parallel across queries.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // Norms are per-VECTOR, computed once before the pair join — cosine()
    // inside the join would re-derive both norms per PAIR, tripling the
    // hot-path dot products (the dominant flops at 100 TB).
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = candidates.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
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
      .withColumn("nrm", norm(col("dv"))) // once per vector, not per pair
    val a = v.select(col("bucket"), col("vec_id").as("q_id"),
      col("dv").as("qv"), col("nrm").as("qn"))
    val b = v.select(col("bucket"), col("vec_id").as("c_id"),
      col("dv").as("cv"), col("nrm").as("cn"))
    val scored = a.join(b, "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("bucket"), col("c_id").as("nn_id"), col("cos"))
  }

  /** MUTUAL (reciprocal) nearest neighbors: pairs where each vector is
    * the OTHER's in-bucket top-1 — the high-precision slice of the
    * near-dup signal (one-directional top-1 fires for every vector, even
    * ones with no close neighbor; reciprocity is the classic
    * dataset-pruning / cross-encoder-candidate filter because it demands
    * agreement from both sides). Built on [[annBucketed]]'s top-1 frame:
    * one keyed self-semi-join, each surviving pair emitted once (a < b).
    * The rounded cosine is direction-symmetric, so the kept direction's
    * score is THE pair score.
    */
  def mutualNearest(vecs: DataFrame, nBits: Int): DataFrame = {
    val top1 = annBucketed(vecs, nBits)
      .select(col("q_id"), col("nn_id"), col("cos"))
    val back = top1.select(col("q_id").as("nn_id"), col("nn_id").as("q_id"))
    top1.join(back, Seq("q_id", "nn_id"), "left_semi")
      .filter(col("q_id") < col("nn_id"))
      .select(col("q_id").as("vec_a"), col("nn_id").as("vec_b"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs: the vector-space member of the
    * dedup family (exact / MinHash / SimHash / Jaccard live in Dedup).
    * Candidates meet only inside their sign-LSH bucket — a keyed self-join,
    * never all-pairs — then the exact cosine filter keeps pairs at or above
    * `minCos`. At 100 TB the bucket is the shuffle key and recall is tuned
    * by nBits (fewer bits → bigger buckets → higher recall, more compute).
    */
  def cosineNearDupPairs(vecs: DataFrame, nBits: Int, minCos: Double): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .withColumn("bucket", signBucket(col("dv"), nBits))
      .withColumn("nrm", norm(col("dv"))) // once per vector, not per pair
    val a = v.select(col("bucket"), col("vec_id").as("id_a"),
      col("dv").as("va"), col("nrm").as("na"))
    val b = v.select(col("bucket"), col("vec_id").as("id_b"),
      col("dv").as("vb"), col("nrm").as("nb"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  /** Coarse-quantizer centroids: per-label per-dimension mean, re-assembled
    * into an ordered array. Components are rounded (9 dp) so the quantizer
    * is bit-identical across engines. Centroid count = #labels (small) —
    * always the broadcast side.
    */
  def centroids(vecs: DataFrame): DataFrame =
    vecs.select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(round(avg("x"), 9).as("m"))
      .groupBy("label").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
      .select(col("label").as("cell"), col("cv"))

  /** Same contract as [[centroids]], via the single-buffer `graft_vec_sum`
    * aggregate: one row per vector through the shuffle instead of `dim`
    * (pos, x) rows, and no second groupBy to reassemble the array. At
    * 100 TB this cuts the quantizer-build shuffle by the embedding
    * dimension (64-1536×). The per-element `transform` lambda here touches
    * only #labels rows — off the hot path.
    */
  def centroidsAgg(vecs: DataFrame): DataFrame =
    vecs.groupBy("label")
      .agg(graft.functions.VectorSumAgg.column(asDouble(col("embedding"))).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label").as("cell"),
        transform(col("sv"), x => round(x / col("n"), 9)).as("cv"))

  /** [[labelCentroidNorms]] computed via `graft_vec_sum` (same output). */
  def labelCentroidNormsAgg(vecs: DataFrame): DataFrame =
    vecs.groupBy("label")
      .agg(graft.functions.VectorSumAgg.column(asDouble(col("embedding"))).as("sv"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"),
        round(sqrt(aggregate(transform(col("sv"), x => {
          val m = x / col("n_vecs"); m * m
        }), lit(0.0), (acc, y) => acc + y)), 6).as("centroid_norm"),
        col("n_vecs"))

  /** IVF: assign every vector to its nearest centroid cell (argmax cosine,
    * ties → lower cell id), then search top-1 within the cell. The cell id
    * is the join/partition key — at cluster scale each cell's candidate
    * list is a separate partition and the centroid table is broadcast.
    */
  /** IVF coarse assignment: every vector joined (broadcast) against the
    * label-mean centroid table, argmax rounded cosine → its cell (ties →
    * lower cell id). Both argmaxes here and downstream are top-1s, so they
    * are max(struct(...)) aggregates, NOT row_number windows: groupBy gets
    * map-side partial aggregation and no per-partition sort — at scale the
    * difference between a combine and a full sort of vecs × centroids.
    * Persisted: callers self-join the assignment — without it the
    * centroid-scoring cross-join runs once per side.
    */
  def assignCells(vecs: DataFrame): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .withColumn("dn", norm(col("dv"))) // once per vector, not per pair
    val cent = centroidsAgg(vecs).withColumn("cn", norm(col("cv")))
    val scoredCells = v.crossJoin(broadcast(cent))
      .withColumn("ccos",
        round(dot(col("dv"), col("cv")) / (col("dn") * col("cn")), 6))
    scoredCells
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cell")).as("nc"),
        col("cell"), col("dv"), col("dn"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"),
        col("m.dv").as("dv"), col("m.dn").as("dn"))
      .persistTracked()
  }

  def ivfTopK(vecs: DataFrame): DataFrame = {
    val members = assignCells(vecs)
    val a = members.select(col("cell"), col("vec_id").as("q_id"),
      col("dv").as("qv"), col("dn").as("qn"))
    val b = members.select(col("cell"), col("vec_id").as("c_id"),
      col("dv").as("cv2"), col("dn").as("cn2"))
    val scored = a.join(b, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")), 6))
    scored.groupBy(col("q_id"))
      .agg(max(struct(col("cos"), (-col("c_id")).as("nc"),
        col("c_id"), col("cell"))).as("m"))
      .select(col("q_id"), col("m.cell").as("cell"),
        col("m.c_id").as("nn_id"), col("m.cos").as("cos"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup = cluster the embedding
    * space coarsely, then drop near-duplicates WITHIN each cluster — the
    * clustering bounds the candidate set so the pair scan is per-cell, never
    * corpus-wide all-pairs. Keeper rule: lowest vec_id in each near-dup
    * neighborhood survives; a vector is dropped iff some LOWER-id member of
    * its cell sits at cosine ≥ minCos. Output: one row per dropped vector
    * (vec_id, cell, max cosine to a lower-id neighbor — the dedup witness).
    * At 100 TB the cell id is the shuffle key, identical shape to [[ivfTopK]].
    */
  def semDedupDrops(vecs: DataFrame, minCos: Double): DataFrame = {
    val members = assignCells(vecs)
    val a = members.select(col("cell"), col("vec_id").as("id_a"),
      col("dv").as("va"), col("dn").as("na"))
    val b = members.select(col("cell"), col("vec_id").as("id_b"),
      col("dv").as("vb"), col("dn").as("nb"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .groupBy(col("id_b").as("vec_id"), col("cell"))
      .agg(max(col("cos")).as("max_lower_cos"))
  }

  /** Int8 scalar quantization per vector — the 100 TB ANN memory/IO trick:
    * q_i = ⌊x_i·127/max|x| + 0.5⌋ stores a vector in dim bytes instead of
    * 4·dim, and integer dot products drive the candidate scan. Output per
    * vector: exact integer ‖q‖² (cross-engine-exact witness that the codes
    * match bit-for-bit), the reconstruction-error L2 norm, and the scale.
    * One codegen'd `graft_int8_quantize` call per row — zero exchanges
    * (the previous posexplode → amax-join → re-aggregate shape shuffled
    * dim× the row count twice); all-zero vectors (no scale) are dropped,
    * matching the oracle's `amax > 0` filter.
    */
  def quantizeInt8(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
        graft.functions.Int8QuantizeExpr.column(asDouble(col("embedding"))).as("z"))
      .filter(col("z").isNotNull)
      .select(col("vec_id"), col("z.qnorm2").as("qnorm2"),
        round(col("z.err"), 6).as("err"), round(col("z.amax"), 6).as("amax"))

  /** One-row flattened PQ codebook: the per-label mean centroids (9 dp,
    * bit-identical cross-engine) concatenated label-major into a single
    * array<double>. One row → always the broadcast side; the downstream
    * crossJoin is the bounded one-row-aggregate shape t5/t6 use.
    * The transform/flatten lambdas touch #labels rows — off the hot path.
    */
  def pqCodebook(vecs: DataFrame): DataFrame =
    centroidsAgg(vecs).agg(
      flatten(transform(array_sort(collect_list(struct(col("cell"), col("cv")))),
        s => s.getField("cv"))).as("cb"))

  /** Product quantization encode (Jégou et al. 2011): each vector's m
    * subvectors quantized to the nearest codebook centroid — dim floats
    * become m small codes. One codegen'd `graft_pq_encode` call per row
    * against the broadcast one-row codebook: zero shuffles over the corpus.
    * Output: per-vector codes (as columns, driver-sortable) + the rounded
    * L2 reconstruction error.
    */
  def pqEncode(vecs: DataFrame, m: Int): DataFrame = {
    val enc = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .crossJoin(broadcast(pqCodebook(vecs)))
      .select(col("vec_id"),
        graft.functions.PqExprs.encodeColumn(col("dv"), col("cb"), m).as("z"))
    val codeCols = (0 until m).map(s =>
      element_at(col("z.codes"), s + 1).as(s"code$s"))
    enc.select(col("vec_id") +: codeCols :+ col("z.err").as("err"): _*)
  }

  /** PQ asymmetric-distance top-1: candidates are scanned through their
    * codes only — per pair the score is m lookups into the query's k×m
    * distance table, never a touch of the raw candidate vector (the reason
    * PQ survives 100 TB: the code table is 64× smaller than the vectors
    * and the per-candidate cost is O(m), not O(dim)). The bounded query
    * set (tables in hand) broadcasts; ties → lower candidate id.
    */
  def pqAdcTop1(vecs: DataFrame, m: Int, nQueries: Int): DataFrame = {
    // The codebook is a corpus-wide centroid aggregation feeding BOTH
    // crossJoins below (candidate encode + query distance tables); without
    // the persist the full-scan aggregate executes twice per run.
    val cb = pqCodebook(vecs)
      .persistTracked()
    val cand = vecs.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("dv"))
      .crossJoin(broadcast(cb))
      .select(col("c_id"),
        graft.functions.PqExprs.encodeColumn(col("dv"), col("cb"), m)
          .getField("codes").as("codes"))
    val qs = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("qv"))
      .crossJoin(broadcast(cb))
      .select(col("q_id"),
        graft.functions.PqExprs.distTableColumn(col("qv"), col("cb"), m).as("tbl"))
    // Σ_s tbl[codes[s]·m + s], summed in s order (matches the oracle's
    // ordered list_sum), then rounded like every scored output.
    val adist = round((0 until m).map(s =>
      element_at(col("tbl"), element_at(col("codes"), s + 1) * m + s + 1))
      .reduce(_ + _), 6)
    cand.crossJoin(broadcast(qs))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("adist", adist)
      .groupBy("q_id")
      .agg(max(struct((-col("adist")).as("na"), (-col("c_id")).as("nc"),
        col("c_id"), col("adist"))).as("mx"))
      .select(col("q_id"), col("mx.c_id").as("nn_id"), col("mx.adist").as("adist"))
  }

  /** Lloyd k-means training — the real coarse-quantizer fit behind IVF/PQ
    * (v4/v8 quantize against label means; production trains the cells).
    * Deterministic contract so the merge of T iterations is
    * oracle-replicable: init = the k lowest vec_ids in id order;
    * assignment distance is the rounded-6dp squared L2 (the PqExprs
    * arithmetic, m = 1 → the whole vector is one subspace), ties → lower
    * cell; new centroid = per-dim mean rounded to 9 dp (the v4/v5
    * quantizer contract); an emptied cell keeps its previous centroid.
    *
    * Scale shape per iteration: the k×dim codebook is a plan literal
    * (broadcast-sized — it IS the model), assignment is a zero-shuffle
    * codegen'd map over the corpus, and the update is ONE keyed
    * per-cluster `graft_vec_sum` aggregate (one shuffled row per vector,
    * not per dim). The k-row collect per round is the model update, the
    * same driver shape as BPE's per-merge argmax. Output: the final
    * assignment (vec_id, cluster, d2).
    */
  def kmeans(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .persistTracked()
    // Init = the k LOWEST vec_ids (a bounded sort, NOT `vec_id < k`: ids
    // need not be 0-based or contiguous), cluster-labeled by ordinal rank
    // in that id order — the oracle derives its labels from the same
    // ranked list, so parity never depends on the id values themselves.
    val init = v.orderBy("vec_id").limit(k)
      .select("dv").collect().map(_.getSeq[Double](0))
    require(init.length == k, s"kmeans: need >= $k vectors, got ${init.length}")
    val dim = init.head.length
    require(init.forall(_.length == dim), "kmeans: ragged embedding dims")
    var cb: Array[Double] = init.flatten.toArray
    def assigned = {
      val tbl = graft.functions.PqExprs.distTableColumn(
        col("dv"), typedlit(cb.toSeq), 1)
      v.withColumn("tbl", tbl)
        .withColumn("d2", array_min(col("tbl")))
        .withColumn("cluster",
          (array_position(col("tbl"), col("d2")) - 1).cast("int"))
    }
    for (_ <- 1 to iters) {
      val means = assigned.groupBy("cluster")
        .agg(graft.functions.VectorSumAgg.column(col("dv")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cluster"),
          transform(col("s"), x => round(x / col("n"), 9)).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      val next = new Array[Double](cb.length)
      for (cl <- 0 until k) {
        val c = means.getOrElse(cl, cb.slice(cl * dim, (cl + 1) * dim).toSeq)
        var j = 0
        c.foreach { x => next(cl * dim + j) = x; j += 1 }
      }
      cb = next
    }
    // v stays persisted for the final assignment job; the sweep harnesses
    // (Bench/Verify) clear caches between queries.
    assigned.select(col("vec_id"), col("cluster"), col("d2"))
  }

  /** [[kmeans]] with the codebook carried as a BROADCAST one-row frame
    * instead of a plan literal — the large-k path. A k×dim literal is
    * baked into every iteration's generated code and driver plan; past
    * ~1e5–1e6 doubles (k in the thousands at dim 64–1024, the IVF regime)
    * that bloats codegen and plan serialization, while a broadcast ships
    * the same bytes through the block manager once per iteration and keeps
    * generated-code size O(1) in k. Same deterministic contract and
    * arithmetic — bit-identical assignments to [[kmeans]] (KmeansSpec) —
    * and the model never visits the driver: init is a bounded sort, the
    * update is a k-row joined frame (localCheckpoint truncates the
    * per-iteration lineage), so driver state is just the loop counter.
    */
  def kmeansBroadcast(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .persistTracked()
    assignByCodebook(v, cbFrameOf(fitOn(v, k, iters)))
      .select(col("vec_id"), col("cluster"), col("d2"))
  }

  /** v19: SSL-PROTOTYPE PRUNING (Sorscher et al., NeurIPS 2022 "Beyond
    * neural scaling laws"): k-means the embedding space, score each
    * example by its distance to its cluster centroid (prototypicality),
    * and — in the abundant-data regime — KEEP the hardest `keepFrac` of
    * every cluster (farthest from the prototype), dropping the easy
    * redundant core. Per-cluster quotas (⌈keepFrac·n_c⌉) preserve
    * coverage of the embedding space, where a global distance cut would
    * empty small clusters. The published embedding-side complement of
    * SemDedup (d16 drops near-duplicates; this drops the over-represented
    * easy mass).
    *
    * Scale shape: the Lloyd fit is the broadcast-codebook path, the rank
    * is a window PARTITIONED BY cluster (parallel across clusters; for
    * tiny k over a huge corpus swap the exact rank for a per-cluster
    * approx-quantile d2 threshold — same selection up to boundary ties),
    * and the quota join broadcasts the k-row count table. Ties in the
    * rounded d2 are pinned by vec_id (DeterminismAuditSpec class).
    */
  def prototypePrune(vecs: DataFrame, k: Int, iters: Int,
      keepFrac: Double): DataFrame = {
    val assigned = kmeansBroadcast(vecs, k, iters).persistTracked()
    val counts = assigned.groupBy("cluster").agg(count(lit(1)).as("nc"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("d2").desc, col("vec_id"))
    assigned.withColumn("proto_rank", row_number().over(w))
      .join(broadcast(counts), "cluster")
      .filter(col("proto_rank") <= ceil(lit(keepFrac) * col("nc")))
      .select(col("vec_id"), col("cluster"), col("d2"),
        col("proto_rank"), col("nc").as("cluster_size"))
  }

  /** v21: IVF INDEX-HEALTH REPORT — the occupancy summary an index
    * maintainer watches to decide when to RETRAIN/REBALANCE: inverted-list
    * sizes (min/max), the imbalance factor max_cell / (n/k) (search cost
    * is dominated by the largest probed list — an imbalance of i means
    * worst-case probes scan i× the balanced cost; FAISS's
    * imbalance_factor), and the trained-but-empty cell count (wasted
    * codebook capacity; k-means collapse symptom). Drift in this report
    * is the signal that the e13 ingest stream has shifted distribution
    * past the pinned model and the index wants its retraining cadence.
    *
    * Scale shape: the Lloyd fit + one keyed per-cell count + one
    * all-to-one rollup of k rows. One output row; exact-integer ratios
    * rounded 6 dp.
    */
  def ivfHealthReport(vecs: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansBroadcast(vecs, k, iters)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(lit(k).as("k"), sum("n").as("n_vecs"),
        min("n").as("min_cell"), max("n").as("max_cell"),
        round(max("n").cast("double") * k / sum("n"), 6).as("imbalance"),
        (lit(k) - count(lit(1))).cast("int").as("n_empty"))

  /** Trained-quantizer fit: the final (cl, c) centroid frame of the
    * broadcast Lloyd loop — the model [[ivfTrainedTop1]] probes against.
    * Auto-sampled: above [[AutoTrainThreshold]] rows the Lloyd loop
    * trains on the [[trainSample]] slice (the e13 standing-index build
    * rides this default).
    */
  def kmeansFit(vecs: DataFrame, k: Int, iters: Int): DataFrame =
    fitAuto(vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .persistTracked(), k, iters)

  /** The deterministic hash-sample predicate [[kmeansSampled]] trains on:
    * keep a vector iff (vec_id · 1000003) mod `sampleMod` < `sampleKeep`.
    * Knuth's multiplicative scheme — the prime multiplier maps consecutive
    * ids onto a scattered residue progression (so the sample is immune to
    * stride patterns in id assignment), and plain BIGINT arithmetic
    * reproduces bit-identically in any engine, unlike an engine-specific
    * murmur3 `hash()`. Deterministic (not `TABLESAMPLE`/rand()) so the
    * fit is replayable: same corpus → same sample → same model.
    *
    * The id is reduced mod `sampleMod` BEFORE the multiply — ((id mod m)
    * · p) mod m ≡ (id · p) mod m, but the reduced product is bounded by
    * m·p (< 2⁴⁵), where the raw product overflows Long for near-max ids:
    * Spark wraps silently while an oracle engine may raise or go
    * negative, silently diverging the sample membership cross-engine
    * (ADVICE r15). The inner pmod also pins negative ids to the same
    * nonnegative residue the oracle's ((id % m + m) % m) spelling
    * computes.
    */
  def trainSample(idCol: Column, sampleMod: Int, sampleKeep: Int): Column =
    pmod(pmod(idCol, lit(sampleMod.toLong)) * lit(1000003L),
      lit(sampleMod.toLong)) < lit(sampleKeep.toLong)

  /** Corpus-size gate and sample rate for AUTO-SAMPLED Lloyd training —
    * the v24 rule as the DEFAULT for every standing-index build (v12–v18,
    * v20, e13): above [[AutoTrainThreshold]] rows the fit trains on the
    * [[trainSample]] hash sample and only the one final assignment sees
    * the full corpus; at or below it the fit stays full-corpus, where one
    * extra scan per iteration is cheaper than any sampling bias (the
    * KmeansSpec unit fixtures pin that path bit-for-bit). The gate is
    * DECLARATIVE — the one-row corpus count broadcasts into the filter
    * predicate, no driver-side count job — so the choice replays
    * identically in the oracle as a scalar subquery.
    */
  val AutoTrainThreshold = 256L
  val SampleMod = 9973
  val SampleKeep = 3989

  /** The training slice an auto-sampled fit reads: everything when the
    * corpus is at or under [[AutoTrainThreshold]] rows, the deterministic
    * hash sample above it.
    */
  private def autoTrainSlice(v: DataFrame): DataFrame =
    v.crossJoin(broadcast(v.agg(count(lit(1)).as("n_corpus"))))
      .filter(col("n_corpus") <= AutoTrainThreshold ||
        trainSample(col("vec_id"), SampleMod, SampleKeep))
      .drop("n_corpus")

  /** [[fitOn]] through [[autoTrainSlice]] — the default trainer for
    * standing-index builds (100-TB rule: never feed the full corpus
    * through T training scans when a fixed-rate sample estimates every
    * centroid to O(1/√n_cell)).
    */
  private def fitAuto(v: DataFrame, k: Int, iters: Int): DataFrame =
    fitOn(autoTrainSlice(v), k, iters)

  /** [[kmeansBroadcast]] with the Lloyd fit running on a deterministic
    * hash SAMPLE of the corpus — the 100-TB trainer. Full-corpus Lloyd
    * re-scans all N vectors on every one of T iterations, so at petabyte
    * scale the TRAINER (not the probe) becomes the index build's wall.
    * k-means' objective is a sample mean; a uniform n-vector sample
    * estimates each centroid to O(1/√n_cell), so training on a fixed-rate
    * sample and assigning the full corpus ONCE at the end cuts the build
    * from O(N·T) scans to O(N + n·T) with negligible centroid drift once
    * cells hold thousands of samples. Same Lloyd contract as [[kmeans]]
    * applied to the sampled set: init = ordinal labels over the k lowest
    * SAMPLED vec_ids, rounded-6dp assignment distance with ties → lower
    * cell, 9-dp per-dim means, emptied cells keep their centroid. Keep
    * full-train ([[kmeans]]) for small corpora, where one extra scan per
    * iteration is cheaper than any sampling bias. Output: the FULL
    * corpus' final assignment (vec_id, cluster, d2).
    */
  def kmeansSampled(vecs: DataFrame, k: Int, iters: Int,
      sampleMod: Int, sampleKeep: Int): DataFrame = {
    require(sampleMod > 0 && sampleKeep > 0 && sampleKeep <= sampleMod,
      s"kmeansSampled: need 0 < sampleKeep <= sampleMod, got $sampleKeep/$sampleMod")
    val v = prepV(vecs)
    val tr = v.filter(trainSample(col("vec_id"), sampleMod, sampleKeep))
    assignByCodebook(v, cbFrameOf(fitOn(tr, k, iters)))
      .select(col("vec_id"), col("cluster"), col("d2"))
  }

  /** Assign vectors to the cells of an ALREADY-TRAINED model
    * ([[kmeansFit]]'s (cl, c) frame) — the ingest half of a standing IVF
    * index: new vectors route into existing inverted lists WITHOUT
    * retraining (retraining would re-cell the whole standing corpus; an
    * index ingests deltas against a pinned model and retrains on its own
    * cadence). One broadcast of the k-row codebook, a codegen'd argmin
    * map, zero shuffle — per micro-batch this is a pure narrow pass, the
    * e13 streaming-ingest shape. Output: (vec_id, cell, d2), d2 the
    * rounded-6dp squared L2 to the winning centroid.
    */
  def assignWithModel(vecs: DataFrame, model: DataFrame): DataFrame =
    assignByCodebook(
      vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv")),
      cbFrameOf(model))
      .select(col("vec_id"), col("cluster").as("cell"), col("d2"))

  /** The Lloyd loop of [[kmeansBroadcast]] over a pre-projected (vec_id,
    * dv) frame. Init = ordinal labels over the k lowest ids (the
    * single-partition window is bounded at k rows — the limit(k) output,
    * not corpus-scale); per round the assignment is the broadcast-codebook
    * map and the update a k-row joined frame, localCheckpoint-truncated.
    * Each iteration scans the frame it is GIVEN — at corpus scale pass a
    * hash sample and assign the full corpus once ([[kmeansSampled]]),
    * don't feed 100 TB through T training scans.
    */
  private def fitOn(v: DataFrame, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var cent: DataFrame = v.orderBy("vec_id").limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("int").as("cl"), col("dv").as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val means = assignByCodebook(v, cbFrameOf(cent)).groupBy("cluster")
        .agg(graft.functions.VectorSumAgg.column(col("dv")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cluster").as("cl"),
          transform(col("s"), x => round(x / col("n"), 9)).as("c"))
      // Emptied cells keep their previous centroid (left join + coalesce).
      cent = cent.as("p").join(means.as("m"), Seq("cl"), "left")
        .select(col("cl"), coalesce(col("m.c"), col("p.c")).as("c"))
        .localCheckpoint()
    }
    cent
  }

  /** One flattened codebook row in cl order (array_sort on the struct
    * sorts by the leading cl field) — the broadcast side of the
    * assignment map.
    */
  private def cbFrameOf(cent: DataFrame): DataFrame =
    cent.agg(flatten(transform(
      array_sort(collect_list(struct(col("cl"), col("c")))),
      s => s.getField("c"))).as("cb"))

  /** Nearest-centroid assignment against a broadcast one-row codebook:
    * rounded-6dp squared L2 (the PqExprs kernel, m = 1), ties → lower
    * cell via array_position's first-match.
    */
  private def assignByCodebook(v: DataFrame, cbF: DataFrame): DataFrame =
    v.crossJoin(broadcast(cbF))
      .withColumn("tbl", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), 1))
      .withColumn("d2", array_min(col("tbl")))
      .withColumn("cluster",
        (array_position(col("tbl"), col("d2")) - 1).cast("int"))

  /** IVF search over a TRAINED coarse quantizer — v4's probe shape with
    * [[fitOn]]'s Lloyd-trained codebook in place of label means (the
    * production ANN index build: train cells, invert the corpus, probe a
    * few cells per query). Per query: rank cells by the rounded-6dp
    * squared L2 to their centroid, search the nprobe nearest cells'
    * inverted lists, return the top-1 neighbor (ties → lower cell / lower
    * candidate id). Scale shape: the codebook is one broadcast row, the
    * corpus assignment is a zero-shuffle codegen'd map, the probe is a
    * KEYED join on cell (never all-pairs), and the final top-1 is a
    * map-side-combined max(struct) argmax, not a window sort. Recall vs
    * exhaustive search is tunable by nprobe (v11 measures the analogous
    * trade for the label-mean quantizer).
    */
  def ivfTrainedTop1(vecs: DataFrame, k: Int, iters: Int, nprobe: Int,
      nQueries: Int): DataFrame = {
    val v = prepV(vecs)
    top1By(ivfScoredPairsOn(v, cbFrameOf(fitAuto(v, k, iters)), nprobe,
      nQueries), "d2")
  }

  private def prepV(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), asDouble(col("embedding")).as("dv"))
      .persistTracked()

  /** Per-query argmax by (lowest score, lowest c_id) — a map-side-combined
    * max(struct), never a window sort over the candidate set.
    */
  private def top1By(pairs: DataFrame, score: String): DataFrame =
    pairs.groupBy("q_id")
      .agg(max(struct((-col(score)).as("ns"), (-col("c_id")).as("nc"),
        col("c_id"), col(score))).as("m"))
      .select(col("q_id"), col("m.c_id").as("nn_id"),
        col(s"m.$score").as(score))

  /** Trained-IVF candidate pairs (the v12 core): probe the nprobe nearest
    * trained cells per query, exact rounded-6dp pair distance inside them.
    * Returns (q_id, c_id, d2) — one row per (query, probed candidate).
    */
  private def ivfScoredPairsOn(v: DataFrame, cbF: DataFrame, nprobe: Int,
      nQueries: Int): DataFrame = {
    // Inverted lists: every vector in exactly one trained cell.
    val members = assignByCodebook(v, cbF)
      .select(col("cluster").as("cell"), col("vec_id").as("c_id"),
        col("dv").as("cv"))
    // Query fan-out: nprobe nearest cells per query. The window is over
    // nQueries × k rows (bounded), partitioned per query.
    val qcells = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .select(col("vec_id").as("q_id"), col("dv").as("qv"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"), col("crk"))
    // Probe: keyed join on cell; exact rounded-6dp pair distance in the
    // same aa + cc − 2·ac form as the PqExprs kernel and the oracle.
    // crk (the candidate's cell's probe rank for this query) rides along
    // so recallByNprobe can evaluate several nprobe settings from ONE
    // probe pass — a plain filter on crk recovers any tighter setting.
    qcells.join(members, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("d2", round(dot(col("qv"), col("qv"))
        + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
      .select(col("q_id"), col("c_id"), col("crk"), col("d2"))
  }

  /** IVF-PQ — the COMPLETE trained ANN index (the FAISS IVFPQ shape,
    * Jégou et al. 2011): [[ivfTrainedTop1]]'s Lloyd-trained coarse cells
    * with v9's asymmetric-distance scoring inside the probed cells.
    * Build: ONE corpus pass assigns every vector to its trained cell AND
    * encodes it to m PQ codes against the same trained codebook — after
    * that the raw candidate vectors never participate again. Search: each
    * query ranks cells by the full-dim rounded L2, takes the nprobe
    * nearest, and scores ONLY those cells' members through their codes —
    * m table lookups per candidate (O(m), not O(dim)) via a KEYED join on
    * cell. This beats v9's shape exactly where it matters at 100 TB: v9's
    * ADC scan is query-set × corpus (bounded only by the query side);
    * here the inverted lists bound the candidate set and the join key is
    * the shuffle/partition key.
    */
  def ivfPqTop1(vecs: DataFrame, k: Int, iters: Int, m: Int, nprobe: Int,
      nQueries: Int): DataFrame = {
    val v = prepV(vecs)
    top1By(ivfPqAdcPairsOn(v, cbFrameOf(fitAuto(v, k, iters)), m, nprobe,
      nQueries), "adist")
  }

  /** Σ_s tbl[codes[s]·m + s] in s order, rounded like every scored output. */
  private def adcSum(tbl: Column, codes: Column, m: Int): Column =
    round((0 until m).map(s =>
      element_at(tbl, element_at(codes, s + 1) * m + s + 1))
      .reduce(_ + _), 6)

  /** IVF-PQ ADC candidate pairs (the v13 core): codes over RAW vectors,
    * one m-subspace ADC table per query. Returns (q_id, c_id, adist).
    */
  private def ivfPqAdcPairsOn(v: DataFrame, cbF: DataFrame, m: Int,
      nprobe: Int, nQueries: Int): DataFrame = {
    // Index build: cell (full-dim argmin) + m codes, one pass, zero shuffle.
    val members = v.crossJoin(broadcast(cbF))
      .withColumn("tbl1", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), 1))
      .select(col("vec_id").as("c_id"),
        (array_position(col("tbl1"), array_min(col("tbl1"))) - 1)
          .cast("int").as("cell"),
        graft.functions.PqExprs.encodeColumn(col("dv"), col("cb"), m)
          .getField("codes").as("codes"))
    // Query side: the m-subspace ADC table rides along; the window is
    // bounded at nQueries × k rows.
    val qs = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .withColumn("tbl", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), m))
      .select(col("vec_id").as("q_id"), col("tbl"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("tbl"), col("cell"))
    qs.join(members, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        adcSum(col("tbl"), col("codes"), m).as("adist"))
  }

  /** v17: ADC search over a PERSISTED on-disk IVF-PQ index — the read
    * side of the index lifecycle (e13 gates the write side). Build: the
    * exact v13 construction (cell assignment + m codes in one pass), but
    * written `partitionBy(cell)` — one DIRECTORY per inverted list, the
    * on-disk spelling of IVF. Search: the probe-cell set (a broadcast
    * one-row codebook against the bounded query set) joins the store
    * scan on the PARTITION column, so Dynamic Partition Pruning skips
    * every unprobed cell's directory at listing time — at 100 TB the
    * search reads nprobe/k of the index from storage, not a fraction of
    * a scan. Output is bit-identical to the in-memory v13 search (same
    * codes, same tables, same rounding), which is the gate: persisting
    * the index and pruning the scan must not move a single distance.
    */
  def ivfPqStoreSearch(vecs: DataFrame, storePath: String, k: Int,
      iters: Int, m: Int, nprobe: Int, nQueries: Int): DataFrame = {
    val v = prepV(vecs)
    val cbF = cbFrameOf(fitAuto(v, k, iters))
    v.crossJoin(broadcast(cbF))
      .withColumn("tbl1", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), 1))
      .select(col("vec_id").as("c_id"),
        (array_position(col("tbl1"), array_min(col("tbl1"))) - 1)
          .cast("int").as("cell"),
        graft.functions.PqExprs.encodeColumn(col("dv"), col("cb"), m)
          .getField("codes").as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(storePath)
    val store = v.sparkSession.read.parquet(storePath)
    val qs = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .withColumn("tbl", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), m))
      .select(col("vec_id").as("q_id"), col("tbl"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("tbl"), col("cell"))
    top1By(
      qs.join(store, "cell")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          adcSum(col("tbl"), col("codes"), m).as("adist")),
      "adist")
  }

  /** v27: DELETE leg of the persisted IVF-PQ index lifecycle — the
    * vector-store counterpart of the lexical store's right-to-be-forgotten
    * path (b8) and compaction (b7), and the missing third verb of the
    * e13(write)/v17(read) pair. FAISS semantics: `remove_ids` never
    * retrains the coarse quantizer, so the model is fit ONCE on the
    * standing corpus (auto-sampled) and pinned; build writes the standing
    * slice `partitionBy(cell)`, a second writer pass APPENDS the delta
    * through the same pinned codebook (incremental ingest, no retrain),
    * then the delete:
    *
    *   1. the deleted ids' CELLS are computed from the store itself (≤ k
    *      rows collected — the inverted-list directory names, never data);
    *   2. ONLY those cell partitions are rewritten: survivors stage to a
    *      scratch path hash-partitioned by cell (one task → one file per
    *      cell, so the delete rewrite doubles as compaction of every
    *      partition it touches), then the affected directories swap in
    *      O(affected cells) driver renames;
    *   3. untouched cells keep their physical files byte-for-byte — at
    *      100 TB a delete of one tenant's vectors costs the affected
    *      inverted lists, not an index rebuild.
    *
    * Search is v17's probe path over the post-delete store (DPP skips
    * unprobed directories). Gate: the result must hash-equal the oracle's
    * standing-trained chain searched over the SURVIVING corpus — one
    * resurrected posting, a stale file, or a dropped survivor flips it.
    */
  def ivfPqStoreDelete(vecs: DataFrame, storePath: String,
      stagePath: String, k: Int, iters: Int, m: Int, nprobe: Int,
      nQueries: Int, standingMin: Long, delFrom: Long,
      delTo: Long): DataFrame = {
    require(delFrom >= nQueries, "query ids must survive the delete")
    val spark = vecs.sparkSession
    val v = prepV(vecs)
    val cbF = cbFrameOf(fitAuto(v.filter(col("vec_id") >= standingMin),
      k, iters))
    def encoded(src: DataFrame): DataFrame =
      src.crossJoin(broadcast(cbF))
        .withColumn("tbl1", graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1))
        .select(col("vec_id").as("c_id"),
          (array_position(col("tbl1"), array_min(col("tbl1"))) - 1)
            .cast("int").as("cell"),
          graft.functions.PqExprs.encodeColumn(col("dv"), col("cb"), m)
            .getField("codes").as("codes"))
    encoded(v.filter(col("vec_id") >= standingMin))
      .write.mode("overwrite").partitionBy("cell").parquet(storePath)
    encoded(v.filter(col("vec_id") < standingMin))
      .write.mode("append").partitionBy("cell").parquet(storePath)
    val isDel = col("c_id") >= delFrom && col("c_id") < delTo
    val preDelete = spark.read.parquet(storePath)
    val delCells = preDelete.filter(isDel).select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    // Stage the affected cells' survivors, one file per cell (the cell is
    // the hash-partition key, so each lands in exactly one task).
    preDelete
      .filter(col("cell").isin(delCells.map(Integer.valueOf): _*) && !isDel)
      .repartition(math.max(delCells.length, 1), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(stagePath)
    // Per-cell commit through the Hadoop FileSystem API (delete live,
    // rename staged → live), resolved from the session's Hadoop conf — the
    // same code path runs unchanged against file://, hdfs://, or any
    // registered scheme; Bucketing.swapPath documents the S3 rename
    // caveat. A cell whose every member was deleted stages no directory at
    // all; the empty inverted list is simply gone from the index.
    // Child paths built with Hadoop Path, not java.io.File: File would
    // mangle a scheme-qualified store URI (hdfs-class schemes get
    // cwd-prefixed), defeating swapPath's scheme portability.
    for (c <- delCells) {
      graft.ops.Bucketing.swapPath(
        new org.apache.hadoop.fs.Path(stagePath, s"cell=$c").toString,
        new org.apache.hadoop.fs.Path(storePath, s"cell=$c").toString)
    }
    val store = spark.read.parquet(storePath)
    require(store.filter(isDel).isEmpty,
      s"deleted ids [$delFrom,$delTo) survived the partition rewrite")
    val qs = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .withColumn("tbl", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), m))
      .select(col("vec_id").as("q_id"), col("tbl"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("tbl"), col("cell"))
    top1By(
      qs.join(store, "cell")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          adcSum(col("tbl"), col("codes"), m).as("adist")),
      "adist")
  }

  /** RESIDUAL-encoded IVF-PQ ADC pairs — the full FAISS IVFADC shape
    * (Jégou et al. 2011 §IV): PQ codes quantize r = v − centroid(cell)
    * instead of v, against a SECOND Lloyd-trained codebook fit on the
    * residuals. Residual energy is a small fraction of vector energy, so
    * the same m×k code budget lands much closer to the true vector —
    * higher recall at identical index size (v15 measures the gap). The
    * query's ADC table is rebuilt per PROBED CELL from q − centroid(cell)
    * (nprobe small tables per query, not one), which is exactly why FAISS
    * defaults to residual encoding for IVF indexes. Scale shape is
    * unchanged from the raw path: both codebooks are one-row broadcasts,
    * build is one corpus pass, probe is the keyed cell join.
    */
  private def residualAdcPairsOn(v: DataFrame, cbF: DataFrame, k2: Int,
      iters2: Int, m: Int, nprobe: Int, nQueries: Int): DataFrame = {
    // Build: cell assignment + residual in one codegen'd pass (the native
    // graft_pq_residual kernel keeps the corpus scan out of interpreted
    // HOF territory), then the residual codebook trains on r-space.
    val withCell = v.crossJoin(broadcast(cbF))
      .withColumn("tbl1", graft.functions.PqExprs.distTableColumn(
        col("dv"), col("cb"), 1))
      .withColumn("cell",
        (array_position(col("tbl1"), array_min(col("tbl1"))) - 1)
          .cast("int"))
      .withColumn("rv", graft.functions.PqExprs.residualColumn(
        col("dv"), col("cb"), col("cell")))
      .select(col("vec_id"), col("cell"), col("rv"))
      .persistTracked()
    val rcbF = cbFrameOf(fitAuto(
      withCell.select(col("vec_id"), col("rv").as("dv")), k2, iters2))
      .select(col("cb").as("rcb"))
    val members = withCell.crossJoin(broadcast(rcbF))
      .select(col("vec_id").as("c_id"), col("cell"),
        graft.functions.PqExprs.encodeColumn(col("rv"), col("rcb"), m)
          .getField("codes").as("codes"))
    // Query side: nprobe cells by full-dim coarse distance, then one
    // residual ADC table per (query, probed cell).
    val qs = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .select(col("vec_id").as("q_id"), col("dv").as("qv"), col("cb"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .withColumn("qrv", graft.functions.PqExprs.residualColumn(
        col("qv"), col("cb"), col("cell")))
      .crossJoin(broadcast(rcbF))
      .withColumn("rtbl", graft.functions.PqExprs.distTableColumn(
        col("qrv"), col("rcb"), m))
      .select(col("q_id"), col("cell"), col("rtbl"))
    qs.join(members, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        adcSum(col("rtbl"), col("codes"), m).as("adist"))
  }

  /** Per-query ADC top-`n` shortlist by (adist, c_id) — bounded at
    * nQueries × candidates, partitioned per query.
    */
  /** v28: SCALAR-QUANTIZED (SQ8) SEARCH with exact re-rank — the FAISS
    * `SQ8` pattern, the flat-index complement of the PQ family: every
    * vector stores as dim int8 codes + one scale (4× smaller than float,
    * 16× smaller than the doubles the exact scorer reads), candidates
    * rank on the DEQUANTIZED L2 estimate
    *   d̂² = ‖q‖²·(a_q/127)² + ‖c‖²·(a_c/127)² − 2·(q·c)·a_q·a_c/127²
    * whose every ingredient is an EXACT integer (code norms and the
    * code dot product — the codegen'd `graft_int8_codes` +
    * `graft_dot` chain, no per-element lambda) times two data-determined
    * scales, so the ranking is bit-stable cross-engine; then ONLY the
    * `shortlist`-deep candidates per query rejoin the raw vectors for
    * the exact rounded-6dp distance (the v14 re-rank discipline: at
    * 100 TB the float vectors stay out of the scan entirely — the hot
    * path reads 1/16th the bytes).
    */
  def sq8Search(vecs: DataFrame, nQueries: Int, shortlist: Int): DataFrame = {
    val v = prepV(vecs)
    def coded(src: DataFrame, id: String, cc: String, aa: String,
        nn: String): DataFrame =
      src.select(col("vec_id").as(id),
          graft.functions.Int8CodesExpr.column(col("dv")).as(cc),
          graft.functions.Int8QuantizeExpr.column(col("dv")).as("_z"))
        .filter(col(cc).isNotNull)
        .select(col(id), col(cc), col("_z.amax").as(aa),
          col("_z.qnorm2").as(nn))
    val qs = coded(v.filter(col("vec_id") < nQueries), "q_id", "qq", "qa",
      "qnq")
    val cs = coded(v, "c_id", "cc", "ca", "qnc")
    val pairs = cs.crossJoin(broadcast(qs))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("qdot", dot(col("qq").cast("array<double>"),
        col("cc").cast("array<double>")))
      .withColumn("est", round(
        col("qnq") * col("qa") * col("qa") / lit(16129.0)
          + col("qnc") * col("ca") * col("ca") / lit(16129.0)
          - lit(2.0) * col("qdot") * col("qa") * col("ca") / lit(16129.0),
        6))
      .select(col("q_id"), col("c_id"), col("est"))
    val short = shortlistBy(pairs, "est", shortlist)
    val q = v.select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val c = v.select(col("vec_id").as("c_id"), col("dv").as("cv"))
    top1By(
      short.join(q, "q_id").join(c, "c_id")
        .withColumn("d2", round(dot(col("qv"), col("qv"))
          + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
        .select(col("q_id"), col("c_id"), col("d2")),
      "d2")
  }

  private def shortlistBy(pairs: DataFrame, score: String, n: Int): DataFrame =
    pairs.withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col(score), col("c_id"))))
      .filter(col("rk") <= n)
      .select(col("q_id"), col("c_id"), col(score))

  /** v14: residual IVF-PQ search with EXACT RE-RANK — the production
    * two-stage ANN search: the compressed index (residual codes) proposes
    * a `shortlist`-deep ADC candidate list, then ONLY those
    * nQueries × shortlist rows rejoin the raw vectors for an exact
    * rounded-6dp distance, and the best exact candidate wins. The re-rank
    * join is bounded by the shortlist (never the corpus), so the raw
    * vectors stay out of the search hot path — at 100 TB the exact pass
    * touches thousandths of a percent of the data.
    */
  def ivfPqResidualRerank(vecs: DataFrame, k: Int, iters: Int, m: Int,
      nprobe: Int, nQueries: Int, shortlist: Int): DataFrame = {
    val v = prepV(vecs)
    val pairs = residualAdcPairsOn(v, cbFrameOf(fitAuto(v, k, iters)),
      k, iters, m, nprobe, nQueries)
    val short = shortlistBy(pairs, "adist", shortlist)
    val q = v.select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val c = v.select(col("vec_id").as("c_id"), col("dv").as("cv"))
    top1By(
      short.join(q, "q_id").join(c, "c_id")
        .withColumn("d2", round(dot(col("qv"), col("qv"))
          + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
        .select(col("q_id"), col("c_id"), col("d2")),
      "d2")
  }

  /** v15: recall@`kAt` report over the three trained-index search paths —
    * exact-scored IVF (v12), raw-code IVF-PQ (v13), and residual-code
    * IVF-PQ (v14's first stage) — against the exact L2 top-`kAt` ground
    * truth. One row per query with the hit counts, recall fractions, and
    * a disagreement witness (the lowest true neighbor each PQ path
    * missed; −1 = none). The ground-truth side is the bounded
    * nQueries × corpus scan (never corpus × corpus); every index side
    * reuses the keyed-cell-join cores. This is the eval a pipeline runs
    * before trusting an index config — and the residual ≥ raw recall
    * ordering is the measurable payoff of residual encoding.
    */
  def annRecallAtK(vecs: DataFrame, k: Int, iters: Int, m: Int, nprobe: Int,
      nQueries: Int, kAt: Int): DataFrame = {
    val v = prepV(vecs)
    val cbF = cbFrameOf(fitAuto(v, k, iters))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val c = v.select(col("vec_id").as("c_id"), col("dv").as("cv"))
    // The ground-truth shortlist feeds SIX consumers (three hit joins, two
    // miss joins, the per-query base count) and each of praw/pres feeds
    // two — without the persists the 20×N exact cross join and both ADC
    // chains would recompute per consumer (v15 was the most expensive
    // bench query for exactly this reason).
    val exact = shortlistBy(
      q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
        .withColumn("d2", round(dot(col("qv"), col("qv"))
          + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
        .select(col("q_id"), col("c_id"), col("d2")),
      "d2", kAt).select("q_id", "c_id").persistTracked()
    val ivf = shortlistBy(ivfScoredPairsOn(v, cbF, nprobe, nQueries),
      "d2", kAt).select("q_id", "c_id")
    val praw = shortlistBy(ivfPqAdcPairsOn(v, cbF, m, nprobe, nQueries),
      "adist", kAt).select("q_id", "c_id").persistTracked()
    val pres = shortlistBy(
      residualAdcPairsOn(v, cbF, k, iters, m, nprobe, nQueries),
      "adist", kAt).select("q_id", "c_id").persistTracked()
    def hitsOf(t: DataFrame, nm: String): DataFrame =
      exact.join(t, Seq("q_id", "c_id"))
        .groupBy("q_id").agg(count(lit(1)).as(nm))
    def missedOf(t: DataFrame, nm: String): DataFrame =
      exact.join(t, Seq("q_id", "c_id"), "left_anti")
        .groupBy("q_id").agg(min("c_id").as(nm))
    val base = exact.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
    base
      .join(hitsOf(ivf, "h_ivf"), Seq("q_id"), "left")
      .join(hitsOf(praw, "h_pq"), Seq("q_id"), "left")
      .join(hitsOf(pres, "h_rpq"), Seq("q_id"), "left")
      .join(missedOf(praw, "m_pq"), Seq("q_id"), "left")
      .join(missedOf(pres, "m_rpq"), Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("h_ivf"), lit(0L)).as("hits_ivf"),
        coalesce(col("h_pq"), lit(0L)).as("hits_pq"),
        coalesce(col("h_rpq"), lit(0L)).as("hits_rpq"),
        round(coalesce(col("h_ivf"), lit(0L)) / lit(kAt.toDouble), 3)
          .as("recall_ivf"),
        round(coalesce(col("h_pq"), lit(0L)) / lit(kAt.toDouble), 3)
          .as("recall_pq"),
        round(coalesce(col("h_rpq"), lit(0L)) / lit(kAt.toDouble), 3)
          .as("recall_rpq"),
        coalesce(col("m_pq"), lit(-1L)).as("missed_pq"),
        coalesce(col("m_rpq"), lit(-1L)).as("missed_rpq"))
  }

  /** v18: FILTERED ANN — a metadata predicate composed WITH the vector
    * search (the "same-language nearest neighbor" / "same-tenant docs
    * only" production shape). The filter applies to the inverted-list
    * members BEFORE scoring (pre-filtering, not search-then-drop), so a
    * selective predicate cannot empty the result by post-filtering a
    * top-k that was computed over the whole corpus — the standard
    * filtered-ANN failure mode. Scale shape unchanged: the predicate
    * rides the keyed cell join as an ordinary join filter, the label
    * column lives beside the vectors in the index. Queries whose probed
    * cells hold no matching candidate drop out (inner semantics), which
    * the oracle reproduces.
    */
  def ivfFilteredTop1(vecs: DataFrame, k: Int, iters: Int, nprobe: Int,
      nQueries: Int): DataFrame =
    top1By(labeledCellPairs(vecs, k, iters, nprobe, nQueries,
      sameLabel = true), "d2")

  /** v20: HARD-NEGATIVE MINING — for each query, the `kNeg` nearest
    * neighbors whose label DIFFERS (the contrastive / metric-learning
    * training-data op: negatives that are close in embedding space are
    * the informative ones; random negatives are trivially separable).
    * Exactly v18's pre-filtered IVF search with the label predicate
    * inverted and the per-query keep widened from top-1 to a ranked
    * top-kNeg. Same scale shape: the predicate rides the keyed cell
    * join, the rank window is per-query over probed-cell candidates
    * only.
    */
  def ivfHardNegatives(vecs: DataFrame, k: Int, iters: Int, nprobe: Int,
      nQueries: Int, kNeg: Int): DataFrame =
    labeledCellPairs(vecs, k, iters, nprobe, nQueries, sameLabel = false)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))))
      .filter(col("rank") <= kNeg)
      .select(col("q_id"), col("rank"), col("c_id").as("neg_id"), col("d2"))

  /** Shared core of v18/v20: scored (q_id, c_id, d2) pairs from the
    * trained-IVF probe, label-predicated BEFORE scoring (`sameLabel`
    * picks the v18 same-label or the v20 different-label composition).
    */
  private def labeledCellPairs(vecs: DataFrame, k: Int, iters: Int,
      nprobe: Int, nQueries: Int, sameLabel: Boolean): DataFrame = {
    val v = vecs.select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("dv"))
      .persistTracked()
    val cbF = cbFrameOf(fitAuto(v.select(col("vec_id"), col("dv")), k, iters))
    // assignByCodebook passes extra columns through — label stays with
    // the member rows, becoming an index column beside the codes.
    val members = assignByCodebook(v, cbF)
      .select(col("cluster").as("cell"), col("vec_id").as("c_id"),
        col("label").as("c_label"), col("dv").as("cv"))
    val qcells = v.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cbF))
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("dv").as("qv"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("dv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_label"), col("qv"), col("cell"))
    val labelPred = if (sameLabel) col("c_label") === col("q_label")
      else col("c_label") =!= col("q_label")
    qcells.join(members, "cell")
      .filter(col("q_id") =!= col("c_id") && labelPred)
      .withColumn("d2", round(dot(col("qv"), col("qv"))
        + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
      .select(col("q_id"), col("c_id"), col("d2"))
  }

  /** v16: recall@kAt as a FUNCTION OF nprobe — the operating-point sweep
    * a pipeline runs to pick the IVF probe width (recall rises with
    * nprobe, so does probe cost; the knee is the production setting).
    * ONE probe pass at max(nprobes) carries each candidate's cell rank
    * (crk); every tighter setting is recovered by a plain crk filter —
    * the sweep costs one search, not |nprobes| searches. Output: one row
    * per nprobe with total hits over the query set and the recall
    * fraction against the exact L2 top-kAt ground truth.
    */
  def recallByNprobe(vecs: DataFrame, k: Int, iters: Int, nQueries: Int,
      kAt: Int, nprobes: Seq[Int]): DataFrame = {
    val v = prepV(vecs)
    val cbF = cbFrameOf(fitAuto(v, k, iters))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val c = v.select(col("vec_id").as("c_id"), col("dv").as("cv"))
    val exact = shortlistBy(
      q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
        .withColumn("d2", round(dot(col("qv"), col("qv"))
          + dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6))
        .select(col("q_id"), col("c_id"), col("d2")),
      "d2", kAt).select("q_id", "c_id")
    val pairs = graft.engine.Caches.persisted(
      ivfScoredPairsOn(v, cbF, nprobes.max, nQueries))
    nprobes.sorted.map { np =>
      val top = shortlistBy(
          pairs.filter(col("crk") <= np).select("q_id", "c_id", "d2"),
          "d2", kAt)
        .select("q_id", "c_id")
      exact.join(top, Seq("q_id", "c_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(np).as("nprobe"), col("hits"),
          round(col("hits") / lit((nQueries * kAt).toDouble), 3).as("recall"))
    }.reduce(_ union _)
  }

  /** v25: SEMANTIC DECONTAMINATION AUDIT — the embedding-space complement
    * of the lexical d32 scan: for every eval item, its nearest TRAINING
    * vector by rounded cosine (ties → lower corpus id). d32 catches
    * verbatim leakage; paraphrased leakage only shows in embedding space,
    * and the audit a pipeline publishes is exactly this table — each
    * benchmark item's closest training neighbor and how close it is (a
    * reviewer reads the top rows; a gate thresholds the cos column).
    *
    * Scale shape: the EVAL side is bounded by the benchmark, so it is the
    * broadcast build side; the corpus streams through ONCE in a narrow
    * codegen'd pass (norms computed per vector before the pair products),
    * and the per-eval argmax is a map-side-combined max(struct) — one
    * shuffled row per (eval, partition), never a window over eval×corpus.
    * Contrast v1's bruteForceTopK (window top-k per query, the readout
    * baseline): this is the shape that survives a 100-TB corpus because
    * nothing corpus-sized is ever sorted or windowed.
    */
  def crossCorpusNearest(corpus: DataFrame, evalVecs: DataFrame): DataFrame = {
    // Zero-norm vectors are EXCLUDED on both sides before the argmax: a
    // single all-zero corpus vector would make cos = 0/0 = NaN, and Spark
    // orders NaN ABOVE every double inside max(struct) — so that one
    // junk vector would silently become every eval item's "nearest"
    // neighbor, corrupting the published audit table (ADVICE r16). A
    // zero vector carries no direction, so it has no cosine neighbor by
    // definition; the oracle applies the same norm > 0 filter.
    val c = corpus.select(col("vec_id").as("c_id"),
        asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .filter(col("cn") > 0)
    val q = evalVecs.select(col("vec_id").as("eval_id"),
        asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(col("qn") > 0)
    c.crossJoin(broadcast(q))
      .withColumn("cos",
        round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 6))
      .groupBy("eval_id")
      .agg(max(struct(col("cos"), (-col("c_id")).as("nc"),
        col("c_id"))).as("m"))
      .select(col("eval_id"), col("m.c_id").as("nn_id"),
        col("m.cos").as("cos"))
  }

  /** v26: IVF-ACCELERATED SEMANTIC DECONTAMINATION — [[crossCorpusNearest]]
    * (v25) is exact but exhaustive: |eval| dot products per corpus vector.
    * Fine for a one-off audit; expensive when the audit reruns per
    * training snapshot at 100 TB × 10k eval items. This is the indexed
    * variant through the v17 store lifecycle: the TRAINING corpus is
    * assigned to Lloyd-trained cells (auto-sampled fit) and persisted
    * `partitionBy(cell)` — one directory per inverted list, so the probe
    * join keyed on the partition column lets Dynamic Partition Pruning
    * skip every unprobed cell's directory at listing time. Each eval
    * vector probes its `nprobe` nearest cells and takes the rounded-cosine
    * argmax among their members only.
    *
    * Because IVF is approximate, the query's published row is the RECALL
    * GATE, not the neighbor table: recall@1 of the indexed answer against
    * v25's exact argmax over the same corpus (the way v11/v15/v16 gate
    * IVF against brute force). A pipeline reads this row to decide
    * whether nprobe is wide enough to trust the indexed audit; nprobe = k
    * probes every cell and must read recall 1.0 (pinned in IvfStoreSpec).
    * Zero-norm vectors are excluded on both sides, as in v25.
    *
    * Scale shape: store build is one corpus pass (broadcast k-row
    * codebook, codegen'd argmin, no shuffle before the partitioned
    * write); the probe is a keyed join against the nprobe pruned
    * directories; the per-eval argmax is the map-side-combined
    * max(struct). The exact leg (the gate's reference) is v25's one
    * corpus stream — so the WHOLE query still costs one corpus pass plus
    * the index probe; a production run that trusts the measured recall
    * drops the exact leg and pays only the probe.
    */
  def ivfDecontamRecall(corpus: DataFrame, evalVecs: DataFrame,
      storePath: String, k: Int, iters: Int, nprobe: Int): DataFrame = {
    val c = prepV(corpus)
    val cbF = cbFrameOf(fitAuto(c, k, iters))
    assignByCodebook(c, cbF)
      .withColumn("cn", norm(col("dv")))
      .filter(col("cn") > 0)
      .select(col("cluster").as("cell"), col("vec_id").as("c_id"),
        col("dv").as("cv"), col("cn"))
      .write.mode("overwrite").partitionBy("cell").parquet(storePath)
    val store = c.sparkSession.read.parquet(storePath)
    val q = evalVecs.select(col("vec_id").as("eval_id"),
        asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(col("qn") > 0)
    // nprobe nearest cells per eval vector — the window is over
    // |eval| × k rows (bounded by the benchmark), partitioned per eval.
    val qcells = q.crossJoin(broadcast(cbF))
      .select(col("eval_id"), col("qv"), col("qn"),
        posexplode(graft.functions.PqExprs.distTableColumn(
          col("qv"), col("cb"), 1)).as(Seq("cell", "cd2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("eval_id").orderBy(col("cd2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("eval_id"), col("qv"), col("qn"), col("cell"))
    val ivf = qcells.join(store, "cell")
      .withColumn("cos",
        round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 6))
      .groupBy("eval_id")
      .agg(max(struct(col("cos"), (-col("c_id")).as("nc"),
        col("c_id"))).as("m"))
      .select(col("eval_id"), col("m.c_id").as("ivf_nn"))
    crossCorpusNearest(corpus, evalVecs)
      .select(col("eval_id"), col("nn_id").as("exact_nn"))
      .join(ivf, Seq("eval_id"), "left")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("ivf_nn") === col("exact_nn"), 1L).otherwise(0L))
          .as("hits"))
      .select(lit(nprobe).cast("int").as("nprobe"), col("n_eval"),
        col("hits"),
        round(col("hits").cast("double") / col("n_eval"), 3).as("recall"))
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
