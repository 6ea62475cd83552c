package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Two strategies with the same output contract (query id, neighbor id,
  * rank, cosine):
  *
  *  - '''knnExact''' — brute-force: broadcast the (small) query set against
  *    the full corpus, exact cosine, per-query top-k window. The right
  *    baseline whenever |queries| is small: one corpus scan, no shuffle of
  *    the corpus, and the window runs over |queries|·k-bounded partitions.
  *  - '''knnLsh''' — sign-bit LSH: corpus and queries are both keyed by a
  *    b-bit sign bucket; the join shuffles on the bucket key so a query only
  *    scores vectors in its own bucket. This is the 100 TB shape: bucket
  *    cardinality 2^b bounds the join fan-out, and the exact cosine rerank
  *    touches only co-bucketed candidates.
  *
  * Cosine is computed on 2^20-scaled int64 vectors (exact integer dot/norm,
  * one final double division) so ranks are bit-identical across engines —
  * see [[graft.functions.VectorFunctions]].
  */
object Similarity {

  /** Hyperplane count scaled to the corpus.
    *
    * Derivation from the target Σ bucket²: with B = 2^bits uniform
    * buckets over n vectors, the bucketed self-join generates
    * Σ bucket² ≈ n²/B candidate pairs. Fixing B ≈ n/target keeps bucket
    * population ≈ `target` and the candidate count ≈ n·target — LINEAR
    * in the corpus. A constant B (round 3's LshBits=6 ⇒ 64 buckets
    * forever) makes candidates n²/64: quadratic, the thing that never
    * finishes at 100 TB. bitsFor returns the smallest b with
    * n ≤ target·2^b, so 1000× the vectors means 1000× the buckets, not
    * 1000× the bucket size. Capped at maxBits (a 64-dim embedding gives
    * at most 64 sign hyperplanes; 16 ⇒ 65k buckets is plenty before
    * multi-probe recall becomes the binding constraint). */
  def bitsFor(n: Long, targetBucketRows: Long, maxBits: Int = 16): Int =
    (1 to maxBits).find(b => n <= (targetBucketRows << b)).getOrElse(maxBits)

  /** Driver-side cap for [[centroidSet]] materialization (~67 MB at
    * 64 dims) — comfortably above the 2^16 corpus-scaled centroid cap. */
  val MaxCentroids: Int = 1 << 17

  /** DuckDB mirror of [[bitsFor]] as a CASE ladder over a COUNT
    * expression — pure integer comparisons, so both engines derive the
    * identical bit count from the identical corpus. */
  def sqlBitsFor(nExpr: String, targetBucketRows: Long,
                 maxBits: Int = 16): String =
    (1 until maxBits).map { b =>
      s"WHEN $nExpr <= ${targetBucketRows << b} THEN $b"
    }.mkString("CASE ", " ", s" ELSE $maxBits END")

  /** √n-scaled bit count for the IVF coarse codebook: smallest b with
    * n ≤ 4^b, so 2^b ≈ √n. The LSH ladder's k ∝ n/target is right for
    * BUCKET population (the self-join is Σ bucket²), but wrong for a
    * TRAINED codebook: k-means assignment costs n·k per pass, and k ∝ n
    * makes training quadratic in the corpus. k ≈ √n is the classic IVF
    * balance — training n·√n, probe cost per query nprobe·√n — the FAISS
    * sizing rule. Capped at maxBits like [[bitsFor]]. */
  def quadBitsFor(n: Long, maxBits: Int = 16): Int =
    (1 to maxBits).find(b => n <= (1L << (2 * b))).getOrElse(maxBits)

  /** DuckDB mirror of [[quadBitsFor]]. */
  def sqlQuadBitsFor(nExpr: String, maxBits: Int = 16): String =
    (1 until maxBits).map { b =>
      s"WHEN $nExpr <= ${1L << (2 * b)} THEN $b"
    }.mkString("CASE ", " ", s" ELSE $maxBits END")

  /** Scalar-row form of [[meanPool]]: one `(key, pos, val, n)` row per
    * centroid lane. Keeps both group size and dimension distributed
    * (posexplode → partial agg on (key, pos)), and emits only scalar
    * columns so results flow through pandas/arrow checkers untouched. */
  def meanPoolLanes(emb: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    emb.select(col(keyCol), posexplode(scaled(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col(keyCol), col("pos"))
      .agg((sum(col("v")).cast(DoubleType) / count(lit(1))).as("val"),
           count(lit(1)).as("n"))
  }

  /** Group-wise elementwise mean of embedding vectors ("mean pooling"):
    * one centroid per key — class centroids, doc-level pooling of chunk
    * embeddings, cluster summaries. Scale shape: `posexplode` fans each
    * vector into (key, lane) rows, a partial-aggregating shuffle on
    * (key, lane) sums each lane, and the array is rebuilt per key — so
    * neither group size nor dimension ever concentrates in one task.
    * Exact math: lane sums are over 2^20-scaled int64 (order-independent),
    * the mean is a single double division per lane — oracle-replicable. */
  def meanPool(emb: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    emb.select(col(keyCol), posexplode(scaled(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col(keyCol), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col(keyCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          e => e.getField("s").cast(DoubleType) / e.getField("n")).as("centroid"),
        max(col("n")).as("n")) // every lane carries the group's row count
  }

  /** Brute-force exact top-k cosine neighbors for queries `idCol < maxQueryId`.
    * Norms are materialized per vector (query and corpus side) so the
    * per-pair work is just the dot product. */
  def knnExact(emb: DataFrame, idCol: String, vecCol: String,
               maxQueryId: Long, k: Int): DataFrame = {
    val scaledEmb = emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"))
      .withColumn("nn", vnorm(col("nv")))
    val queries = emb.filter(col(idCol) < maxQueryId)
      .select(col(idCol).as("q_id"), scaled(col(vecCol)).as("qv"))
      .withColumn("qn", vnorm(col("qv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scaledEmb.join(broadcast(queries), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosineFromNorms(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** Contrastive triplet mining — (anchor, hard positive, sampled
    * negative) rows for embedding-model training. The positive is the
    * anchor's exact top-1 neighbor; the negative is a deterministic
    * hash-argmin draw over OUT-OF-BUCKET candidates (a different sign-LSH
    * bucket ⇒ a structurally dissimilar region), so the "random" negative
    * is reproducible across reruns, engines, and any partitioning — no
    * RNG state anywhere.
    *
    * Scale shape: ONE persisted corpus projection (scaled lanes + norms +
    * bucket, computed once) feeds both the positive ranking and the
    * negative draw against the broadcast anchor set; |anchors| is bounded
    * per batch, so both are knnExact-economics scans of the cache. The
    * positive is excluded from the negative draw even when it falls in a
    * different bucket, so a triplet never degenerates to pos == neg.
    * `margin = cos_pos − cos_neg` rides along as the training-signal
    * diagnostic, exact because both cosines are the engine-portable
    * scaled-int dot products.
    *
    * An anchor with NO out-of-bucket candidate (tiny or fully homogeneous
    * corpus) has no valid negative and is dropped from the output — the
    * inner-join contract a training-pair generator wants (emitting a
    * same-bucket "negative" would poison the batch).
    *
    * @return (q_id, pos_id, cos_pos, neg_id, cos_neg, margin)
    */
  def tripletMining(emb: DataFrame, idCol: String, vecCol: String,
                    maxQueryId: Long, bits: Int,
                    salt: String = "neg"): DataFrame = {
    import graft.functions.TextFunctions.hash28
    val sv = OperatorCaches.register(
      emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"),
          signBucket(col(vecCol), bits).as("nbucket"))
        .withColumn("nn", vnorm(col("nv")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val anchors = sv.filter(col("n_id") < maxQueryId)
      .select(col("n_id").as("q_id"), col("nv").as("qv"),
        col("nn").as("qn"), col("nbucket").as("qbucket"))
    val cands = sv.join(broadcast(anchors), col("n_id") =!= col("q_id"))
      .withColumn("cos",
        cosineFromNorms(col("qv"), col("nv"), col("qn"), col("nn")))
    val posRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    val pos = cands.withColumn("rn", row_number().over(posRank))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("n_id").as("pos_id"), col("cos").as("cos_pos"))
    val negRank = Window.partitionBy(col("q_id"))
      .orderBy(col("nh").asc, col("n_id").asc)
    val neg = cands.filter(col("nbucket") =!= col("qbucket"))
      .join(broadcast(pos), "q_id")
      .filter(col("n_id") =!= col("pos_id"))
      .withColumn("nh", hash28(concat(lit(salt), col("q_id").cast("string"),
        lit(":"), col("n_id").cast("string"))))
      .withColumn("rn", row_number().over(negRank))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("n_id").as("neg_id"), col("cos").as("cos_neg"))
    pos.join(neg, "q_id")
      .select(col("q_id"), col("pos_id"), col("cos_pos"),
        col("neg_id"), col("cos_neg"),
        (col("cos_pos") - col("cos_neg")).as("margin"))
  }

  /** Embedding-cosine near-duplicate pairs: sign-bucket LSH self-join, so
    * candidate generation is Σ bucket² (never all-pairs), then the exact
    * scaled-int cosine threshold. The vector-space analog of the MinHash
    * text dedup: output (vec_a, vec_b, cos) for same-bucket pairs with
    * cos >= threshold. Pass `bits = bitsFor(corpusCount, target)` so the
    * bucket alphabet grows with the corpus. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  bits: Int, threshold: Double): DataFrame = {
    // Persisted: the self-join references this frame on both sides, and
    // Spark recomputes unpersisted subtrees once per reference. Registered
    // for caller-managed release (OperatorCaches.releaseAll after the
    // consuming action) — the cache must outlive this lazy result.
    val bucketed = OperatorCaches.register(
      emb.select(col(idCol).as("id"), scaled(col(vecCol)).as("sv"),
        signBucket(col(vecCol), bits).as("bucket"))
        .withColumn("nrm", vnorm(col("sv")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        cosineFromNorms(col("a.sv"), col("b.sv"),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Collect a (small) centroid frame into a broadcastable
    * [[graft.plans.IvfCentroids]] set — the "train once offline" step of
    * IVF, done explicitly so its cost is decoupled from every query that
    * probes it. Vectors are 2^20-scaled and norms computed with the exact
    * double ops of `vnorm`, so cosines against the set are bit-identical
    * to the DataFrame path (and to the DuckDB oracle). Sorted by id: the
    * kernel's ascending scan makes equal-cosine ties pick the lowest id. */
  def centroidSet(df: DataFrame, idCol: String, vecCol: String): graft.plans.IvfCentroids = {
    // Hard cap on the driver-side materialization: 2^17 × 64 dims × 8 B ≈
    // 67 MB. A "centroid set" bigger than this isn't a centroid set — at
    // that point the inverted lists need a coarser quantizer, not a
    // bigger broadcast.
    val rows = df.select(col(idCol).cast(org.apache.spark.sql.types.LongType),
        scaled(col(vecCol)))
      .limit(MaxCentroids + 1).collect().sortBy(_.getLong(0))
    require(rows.length <= MaxCentroids,
      s"centroid set exceeds $MaxCentroids rows — IVF centroids are " +
        "trained/derived sets, not the corpus; reduce numCentroids")
    require(rows.nonEmpty, "empty centroid set")
    val dim = rows.head.getSeq[Long](1).length
    val ids = new Array[Long](rows.length)
    val flat = new Array[Long](rows.length * dim)
    val norms = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).getLong(0)
      val cv = rows(i).getSeq[Long](1)
      var s = 0L
      var j = 0
      while (j < dim) { val x = cv(j); flat(i * dim + j) = x; s += x * x; j += 1 }
      norms(i) = math.sqrt(s.toDouble)
      i += 1
    }
    graft.plans.IvfCentroids(ids, flat, norms, dim)
  }

  /** Lloyd rounds for the coarse IVF codebook (shared by every trained
    * caller so q45 and the IVF×PQ family can never drift). */
  val IvfCoarseIters: Int = 2
  /** Seed salt of the coarse codebook's deterministic k-means. */
  val IvfCoarseSalt: String = "ivf"

  /** Pack a fitted k-means lanes frame (`(cluster, pos, cval, n)` from
    * `Clustering.kmeansFit`) into a broadcastable [[graft.plans.IvfCentroids]]
    * set — centroid id = cluster id (ascending, so cosine ties at probe
    * time keep the smallest cluster exactly like the oracle's
    * `ORDER BY cos DESC, c_id ASC`), norms computed with the exact double
    * ops of `vnorm` over the integer-quantized lanes. Empty clusters have
    * no lane rows and simply drop out of the set. */
  def centroidSetFromLanes(lanes: DataFrame): graft.plans.IvfCentroids = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val rows = lanes.select(col("cluster").cast(LongType),
        col("pos").cast(IntegerType), col("cval").cast(LongType))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    require(rows.nonEmpty, "empty centroid lanes")
    val byC = rows.groupBy(_._1).toSeq.sortBy(_._1)
    require(byC.length <= MaxCentroids,
      s"centroid set exceeds $MaxCentroids clusters")
    val dim = byC.head._2.length
    require(byC.forall(_._2.length == dim),
      s"ragged centroid lanes: cluster lane counts differ " +
        s"(${byC.map(_._2.length).distinct.sorted.mkString(", ")})")
    val ids = new Array[Long](byC.length)
    val flat = new Array[Long](byC.length * dim)
    val norms = new Array[Double](byC.length)
    var i = 0
    byC.foreach { case (c, laneRows) =>
      ids(i) = c
      var s = 0L
      laneRows.sortBy(_._2).zipWithIndex.foreach { case ((_, _, x), j) =>
        flat(i * dim + j) = x
        s += x * x
      }
      norms(i) = math.sqrt(s.toDouble)
      i += 1
    }
    graft.plans.IvfCentroids(ids, flat, norms, dim)
  }

  /** IVF-bucketed approximate top-k — the inverted-file ANN scale path:
    * every vector is assigned to its nearest centroid (the "list"), and a
    * query scores only the vectors in its `nprobe` nearest lists.
    *
    * The coarse codebook is TRAINED — `Clustering.kmeansFit` with the
    * deterministic hash seeding ([[IvfCoarseSalt]], [[IvfCoarseIters]]
    * Lloyd rounds), so the DuckDB oracle replays the identical structure
    * through the same k-means CTE chain as q77. Trained centroids are
    * what keeps the inverted lists BALANCED on clustered/skewed corpora:
    * the earlier fixed-id rule (centroids = vectors with
    * id < numCentroids) degenerates when the low-id vectors are
    * correlated — one list absorbs the corpus and per-query cost stops
    * being ≈ n·nprobe/numCentroids (see `IvfBalanceSpec`).
    *
    * This overload trains the set, then delegates to [[knnIvfWith]]; at
    * 100 TB you'd train once offline (`Clustering.ivfCoarseCentroids`)
    * and pass the set to every query batch. Scale numCentroids with the
    * corpus (e.g. `1 << bitsFor(n, target)`) to keep lists
    * constant-sized. */
  def knnIvf(emb: DataFrame, idCol: String, vecCol: String,
             maxQueryId: Long, numCentroids: Int, nprobe: Int,
             k: Int): DataFrame =
    knnIvfWith(emb, idCol, vecCol,
      Clustering.ivfCoarseCentroids(emb, idCol, vecCol, numCentroids),
      maxQueryId, nprobe, k)

  /** IVF query against a precomputed centroid set.
    *
    * Assignment and probing run as ONE codegen'd kernel call per vector
    * (`nearest_centroids`, `graft.plans.NearestCentroids`) against the
    * broadcast set — no (vector × centroid) row explosion, no argmax
    * shuffle: the old broadcast-join + partial-agg shape materialized
    * numCentroids rows per vector just to fold them back to one, which at
    * the 2^16-centroid cap dominated the whole query. The probe join then
    * shuffles one row per vector on `c_id`, exactly the inverted-list
    * lookup shape. */
  def knnIvfWith(emb: DataFrame, idCol: String, vecCol: String,
                 cents: graft.plans.IvfCentroids, maxQueryId: Long,
                 nprobe: Int, k: Int): DataFrame = {
    val (assigned, queries) =
      ivfAssignProbes(emb, idCol, vecCol, cents, maxQueryId, nprobe)
    ivfRerank(assigned, queries, k)
  }

  /** The probe join + exact-cosine rerank every IVF serve path ends in:
    * `postings` is the inverted-list side (freshly assigned in
    * [[knnIvfWith]], or LOADED from the persisted cell-partitioned
    * artifact — `Clustering.IvfFlatIndex`) and `queries` the exploded
    * probe rows from [[ivfProbeQueries]]. Queries BROADCAST (a query
    * batch is small by contract), so the corpus-sized postings never
    * shuffle — and when postings come from the `partitionBy(c_id)`
    * artifact, the broadcast join's dynamic partition pruning restricts
    * the scan to the probed cells: serve cost is O(cells touched), not
    * O(corpus). */
  def ivfRerank(postings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    postings.join(broadcast(queries), Seq("c_id"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosineFromNorms(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** The shared IVF structure every centroid-probed path builds on:
    * `assigned` = the corpus with each vector's nearest-centroid cell
    * `(n_id, nv, nn, c_id)`, and `queries` = the probe rows `(q_id, qv,
    * qn, c_id)` — one row per (query, probed cell), the kernel's ordered
    * id array exploded ((cos DESC, c_id ASC)-ranked). Both
    * [[knnIvfWith]] (exact rerank) and `Clustering.ivfPqSearch` (ADC
    * rerank over PQ codes) consume exactly this pair, so cell assignment
    * and probing can never drift between the two ANN paths. */
  def ivfAssignProbes(emb: DataFrame, idCol: String, vecCol: String,
                      cents: graft.plans.IvfCentroids, maxQueryId: Long,
                      nprobe: Int): (DataFrame, DataFrame) =
    (ivfPostings(emb, idCol, vecCol, cents),
      ivfProbeQueries(emb, idCol, vecCol, cents, maxQueryId, nprobe))

  /** The corpus half of [[ivfAssignProbes]] alone — every vector with
    * its nearest-centroid cell, `(n_id, nv, nn, c_id)`: the INVERTED
    * LISTS. This is the Faiss `add` step — assignment against FIXED
    * trained centroids is one codegen'd kernel call per row, no
    * training-state dependence between rows — which is exactly what
    * makes the persisted postings table (`Clustering.IvfFlatIndex`) a
    * monoid over disjoint vector sets: adding a delta batch is
    * kernel-assign + append, and the result equals assigning the union
    * from scratch. */
  def ivfPostings(emb: DataFrame, idCol: String, vecCol: String,
                  cents: graft.plans.IvfCentroids): DataFrame =
    ivfPostingsAttrs(emb, idCol, vecCol, cents, Nil)

  /** [[ivfPostings]] carrying metadata columns (`attrCols`) through onto
    * the postings rows — the storage side of FILTERED ANN search:
    * production retrieval is almost always predicate+vector (`lang =
    * 'en' AND knn(...)`), and a filter column materialized IN the
    * inverted lists lets the serve path push the predicate into the
    * probed-cell scan instead of joining a metadata table per query
    * batch. Attributes ride as plain parquet columns, so min/max stats
    * prune and the filter lands in the scan's PushedFilters. */
  def ivfPostingsAttrs(emb: DataFrame, idCol: String, vecCol: String,
                       cents: graft.plans.IvfCentroids,
                       attrCols: Seq[String]): DataFrame = {
    val sv = emb.select(col(idCol).as("n_id") +: scaled(col(vecCol)).as("nv") +:
        attrCols.map(col): _*)
      .withColumn("nn", vnorm(col("nv")))
    sv.withColumn("c_id",
      element_at(nearestCentroids(cents, col("nv"), col("nn"), 1), 1))
  }

  /** The query half of [[ivfAssignProbes]] alone — probe rows `(q_id,
    * qv, qn, c_id)`, one per (query, probed cell): the kernel's ordered
    * nearest-centroid ids ((cos DESC, c_id ASC)-ranked) exploded to
    * `nprobe` rows. */
  def ivfProbeQueries(emb: DataFrame, idCol: String, vecCol: String,
                      cents: graft.plans.IvfCentroids, maxQueryId: Long,
                      nprobe: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive: $nprobe")
    emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"))
      .withColumn("nn", vnorm(col("nv")))
      .filter(col("n_id") < maxQueryId)
      .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"),
        explode(nearestCentroids(cents, col("nv"), col("nn"), nprobe)).as("c_id"))
  }

  private def nearestCentroids(cents: graft.plans.IvfCentroids,
                               v: org.apache.spark.sql.Column,
                               nn: org.apache.spark.sql.Column,
                               n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    columnOf(graft.plans.NearestCentroids(expressionOf(v), expressionOf(nn), cents, n))
  }

  /** LSH-bucketed approximate top-k. `probeHamming = 1` turns on
    * multi-probe: each query also scores the buckets whose key differs
    * from its own by one hyperplane sign — the classic recall repair for
    * growing bucket alphabets (a near neighbor straddling one hyperplane
    * is found anyway), at probe cost (1 + bits) instead of 2^bits. The
    * probe keys are exploded query-side so the corpus join stays a plain
    * equi-join on the bucket key (shuffle/broadcast-hash friendly). */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             maxQueryId: Long, bits: Int, k: Int,
             probeHamming: Int = 0): DataFrame = {
    require(probeHamming <= 1, "only Hamming-0/1 probing implemented")
    val bucketed = emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"),
      signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("nn", vnorm(col("nv")))
    val probes =
      if (probeHamming == 0) array(col("qbucket"))
      else array(col("qbucket") +:
        (0 until bits).map(d => col("qbucket").bitwiseXOR(lit(1L << d))): _*)
    val queries = emb.filter(col(idCol) < maxQueryId)
      .select(col(idCol).as("q_id"), scaled(col(vecCol)).as("qv"),
        signBucket(col(vecCol), bits).as("qbucket"))
      .withColumn("qn", vnorm(col("qv")))
      .withColumn("probe", explode(probes))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    bucketed.join(broadcast(queries),
        col("bucket") === col("probe") && col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosineFromNorms(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** EMBEDDING-space benchmark decontamination — the semantic sibling of
    * the n-gram paths (`Dedup.bloomDecontam` catches verbatim/near-verbatim
    * leaks; this catches paraphrased ones): flag every corpus vector whose
    * cosine against ANY benchmark vector reaches `minCosine`, reporting
    * the best-matching eval item and its similarity. One row per
    * contaminated corpus id: `(contaminated, eval_match, best_cos)`, ties
    * on best_cos → the largest eval id (the `max(struct)` order, replayed
    * by the oracle).
    *
    * Scale shape (100 TB): eval suites are FIXED and small (bounded by
    * the benchmarks you hold out, not the corpus), so the bench side
    * broadcasts and the whole operator is ONE corpus scan — the
    * nested-loop's n·|bench| cosines partial-aggregate to ≤1 row per
    * corpus vector inside the stage, so nothing corpus-sized shuffles;
    * flagged rows (a tiny fraction by construction) are the only output.
    * A corpus-sized bench side is the wrong tool — that's the symmetric
    * dedup problem, `Clustering.semDedupHier`. */
  def semanticDecontam(corpus: DataFrame, bench: DataFrame, idCol: String,
                       vecCol: String, minCosine: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), scaled(col(vecCol)).as("v"))
      .withColumn("nrm", vnorm(col("v")))
    val b = bench.select(col(idCol).as("eval_id"),
        scaled(col(vecCol)).as("bv"))
      .withColumn("bnrm", vnorm(col("bv")))
    c.crossJoin(broadcast(b))
      .select(col("vid"), col("eval_id"),
        cosineFromNorms(col("v"), col("bv"), col("nrm"), col("bnrm"))
          .as("cos"))
      .filter(col("cos") >= minCosine)
      .groupBy(col("vid"))
      .agg(max(struct(col("cos"), col("eval_id"))).as("best"))
      .select(col("vid").as("contaminated"),
        col("best.eval_id").as("eval_match"),
        col("best.cos").as("best_cos"))
  }
}
