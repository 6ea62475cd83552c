package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),    // near dup of 1
    (4L, "completely different words about spark engines here")
  ).toDF("doc_id", "text")

  test("exact dedup: normalized duplicates cluster; survivor is min id") {
    val clusters = Dedup.exactClusters(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("survivor_id"), r.getAs[Long]("cluster_size")))
    assert(clusters.toSet == Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("exact dedup: whitespace-normalization collapses spacing variants") {
    val d = Seq((1L, "a  b\tc"), (2L, " a b c ")).toDF("doc_id", "text")
    val clusters = Dedup.exactClusters(d, "doc_id", "text").collect()
    assert(clusters.length == 1 && clusters.head.getAs[Long]("cluster_size") == 2L)
  }

  test("minhash LSH: identical docs pair at jaccard 1.0; near-dups found") {
    val grams = docs.select($"doc_id".as("id"),
      array_distinct(shingles($"text", 3)).as("grams"))
    val pairs = Dedup.minhashLshPairs(grams, 16, 4, 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((1L, 2L)) == 1.0)
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) > 0.3 && asMap((1L, 3L)) < 1.0)
    assert(!asMap.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash: identical docs at hamming 0; unrelated docs excluded") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming")))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((1L, 2L)) == 0)
    assert(!asMap.keys.exists { case (a, b) => b == 4L })
  }

  test("simhashPairs: tiled == untiled pair set on a degenerate-bucket corpus") {
    // 24 near-identical docs (all band buckets degenerate) + 8 unrelated:
    // with tileCap = 2 every shared bucket splits into nc >= 2 cells, so
    // the tiled join exercises real multi-cell tiling — the pair set must
    // be IDENTICAL (the guard only splits tasks, never candidates).
    val skewed = ((0 until 24).map(i =>
        (i.toLong, s"the quick brown fox jumps over the lazy dog number $i")) ++
      (24 until 32).map(i =>
        (i.toLong, s"utterly unrelated content ${i * 37} ${i * 101} stands alone")))
      .toDF("doc_id", "text")
    def pairSet(tile: Boolean) =
      Dedup.simhashPairs(skewed, "doc_id", "text", 4, tile = tile, tileCap = 2L)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Int]("hamming"))).toSet
    val untiled = pairSet(false)
    assert(untiled.nonEmpty) // the skewed block really produces near-dups
    assert(pairSet(true) == untiled)
  }

  test("hammingPairs: tiled == untiled pair set under shared-prefix skew") {
    // The scaladoc's degenerate case: all codes share long constant
    // prefixes, so the first bands are corpus-wide buckets. tileCap = 3
    // forces nc > 1 in those buckets; the reranked pair set must match.
    val codes = (0 until 30).map { i =>
      (i.toLong, f"SHAREDPREFIX${i % 5}%d${(i * 7) % 10}%d")
    }.toDF("doc_id", "code")
    def pairSet(tile: Boolean) =
      Dedup.hammingPairs(codes, "doc_id", "code", maxHamming = 2,
          tile = tile, tileCap = 3L)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Int]("hamming"))).toSet
    val untiled = pairSet(false)
    assert(untiled.nonEmpty)
    assert(pairSet(true) == untiled)
  }

  test("shingles guard: docs shorter than n tokens yield no shingles") {
    val d = Seq((1L, "one two")).toDF("doc_id", "text")
    val out = d.select(shingles($"text", 3).as("sh")).collect()
    assert(out.head.getSeq[String](0).isEmpty)
  }

  test("nearDupClusters matches a union-find model on adversarial graphs") {
    // ONE clustering run over disjoint offset components (each Spark run
    // is an iterative multi-job loop, so the adversarial shapes share it):
    // a diameter-9 chain, a star, two merging chains, a cycle + pair, and
    // a late low-id join.
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 9L).map(i => (i, i + 1)),
      Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)),
      Seq((0L, 2L), (2L, 4L), (1L, 3L), (3L, 5L), (4L, 5L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 8L)),
      Seq((10L, 11L), (11L, 12L), (3L, 12L), (0L, 14L)))
    val edges = cases.zipWithIndex.flatMap { case (es, i) =>
      es.map { case (a, b) => (a + 100L * i, b + 100L * i) }
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.nearDupClusters(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("nearDupClusters: chained pairs converge to min-id components") {
    // 1-2-3-4 is a CHAIN (needs multiple propagation rounds), 7-9 is a
    // separate component, 5 appears in no pair (absent from output).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (7L, 7L), (9L, 7L)))
  }

  test("knnExact: nearest neighbor ordering matches exact cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),   // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnExact(emb, "vec_id", "embedding", 1L, 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id")))
    assert(out.toList == List((0L, 1, 1L), (0L, 2, 3L), (0L, 3, 2L)))
  }

  test("cosinePairs: same-bucket pairs above the threshold only") {
    val emb = Seq(
      (0L, Array(1.0f, 0.1f)),
      (1L, Array(0.9f, 0.12f)),   // cos(0,1) ~ 1 -> pair
      (2L, Array(0.1f, 1.0f)),    // same bucket (both positive), low cos? no: cos ~ 0.2
      (3L, Array(-1.0f, -0.1f))   // different bucket -> never considered
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(emb, "vec_id", "embedding", 2, 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.toList == List((0L, 1L)))
  }

  test("knnIvf: probing all lists recovers the exact top-k") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id"))).toList
    val exact = rows(Similarity.knnExact(emb, "vec_id", "embedding", 2L, 3))
    // nprobe == numCentroids: every list probed, so IVF loses nothing
    val ivf = rows(Similarity.knnIvf(emb, "vec_id", "embedding", 2L,
      numCentroids = 2, nprobe = 2, k = 3))
    assert(ivf == exact)
    // nprobe = 1: each query sees only its own list — a strict subset of
    // the all-lists candidate set, so narrow results can only lose pairs
    // relative to the full probe, never invent them.
    val narrow = rows(Similarity.knnIvf(emb, "vec_id", "embedding", 2L,
      numCentroids = 2, nprobe = 1, k = 5))
    val full = rows(Similarity.knnIvf(emb, "vec_id", "embedding", 2L,
      numCentroids = 2, nprobe = 2, k = 5))
    assert(narrow.map(t => (t._1, t._3)).toSet
      .subsetOf(full.map(t => (t._1, t._3)).toSet))
    assert(narrow.size < full.size) // one-list probing really prunes here
  }

  test("knnIvfWith: an externally-built centroid set gives identical top-k") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Double]("cos"))).toList
    val derived = rows(Similarity.knnIvf(emb, "vec_id", "embedding", 2L,
      numCentroids = 2, nprobe = 2, k = 3))
    // The same trained codebook handed in as a prebuilt (offline) set —
    // the 100 TB serve path: train once, broadcast to every query batch.
    val external = graft.operators.Clustering.ivfCoarseCentroids(
      emb, "vec_id", "embedding", 2)
    assert(external.count <= 2 && external.dim == 3)
    val withSet = rows(Similarity.knnIvfWith(emb, "vec_id", "embedding",
      external, 2L, nprobe = 2, k = 3))
    assert(withSet == derived)
  }

  test("IvfCentroids.topN: NaN cosines sort first (max-struct/ORDER BY DESC order)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // centroid 0 is a zero vector (norm 0 -> cosine NaN); centroid 1 real.
    val cents = graft.plans.IvfCentroids(
      ids = Array(0L, 1L),
      flat = Array(0L, 0L, /* c1 */ 1048576L, 0L),
      norms = Array(0.0, 1048576.0), dim = 2)
    val v = new GenericArrayData(Array(1048576L, 0L))
    val got = graft.plans.IvfCentroids.topN(v, 1048576.0, cents, 2)
    // NaN (centroid 0) ranks ABOVE the real cosine 1.0 — exactly how
    // Spark's max(struct)/window DESC and DuckDB's ORDER BY DESC rank NaN.
    assert((0 until got.numElements()).map(got.getLong).toList == List(0L, 1L))
    // all-NaN query (zero vector): ties keep the LOWEST centroid id first
    val zq = new GenericArrayData(Array(0L, 0L))
    val tied = graft.plans.IvfCentroids.topN(zq, 0.0, cents, 2)
    assert(tied.getLong(0) == 0L)
  }

  test("meanPool: per-key elementwise mean, lane order preserved") {
    val emb = Seq(
      (1, Array(1.0f, 2.0f, 3.0f)),
      (1, Array(3.0f, 4.0f, 5.0f)),
      (2, Array(-1.0f, 0.0f, 1.0f))
    ).toDF("label", "embedding")
    val out = Similarity.meanPool(emb, "label", "embedding").collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getSeq[Double](r.fieldIndex("centroid")).toList, r.getAs[Long]("n")))).toMap
    val scale = graft.functions.VectorFunctions.Scale.toDouble
    // exact: (1+3)/2=2, (2+4)/2=3, (3+5)/2=4 in scaled space
    assert(out(1)._1 == List(2.0 * scale, 3.0 * scale, 4.0 * scale))
    assert(out(1)._2 == 2L)
    assert(out(2)._1 == List(-1.0 * scale, 0.0, 1.0 * scale))
    assert(out(2)._2 == 1L)
  }

  test("incrementalLshPairs: guaranteed recall on exact dups, never corpus×corpus") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    import org.apache.spark.sql.functions.col
    def hashed(rows: Seq[(Long, String)]) =
      rows.toDF("id", "text").select(col("id"),
        columnOf(graft.plans.WordShingleHashes(
          expressionOf(col("text")), 2, 7)).as("ghash"))
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val otherText = "one two three four five six seven eight nine ten"
    val corpus = hashed(Seq(
      (100L, corpusText), (101L, corpusText), // corpus-internal exact dup pair
      (102L, otherText)))
    val delta = hashed(Seq(
      (1L, corpusText),                        // exact dup of 100 and 101
      (2L, "totally unrelated words here with zero overlap whatsoever")))
    val out = Dedup.incrementalLshPairs(delta, corpus, 16, 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact duplicates MUST be found (identical signatures collide in
    // every band — the pigeonhole recall guarantee), at jaccard 1.0
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 100L), (1L, 101L)))
    assert(out.forall(_._3 == 1.0))
    // and the corpus-internal pair (100, 101) is never re-mined
  }

  test("hashedLinearScore: exact fold, frequency-weighted, empty-safe") {
    import graft.functions.TextFunctions.{hashedLinearScore, hashedFeatureCount}
    import org.apache.spark.sql.functions.col
    val df = Seq("word word", "word", "", "   ").toDF("text")
      .select(hashedFeatureCount(col("text")).as("n"),
        hashedLinearScore(col("text")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val Seq(twice, once, empty, blank) = df.toSeq
    assert(once._1 == 1 && twice._1 == 2)
    assert(twice._2 == 2 * once._2)       // duplicates keep voting (tf weighting)
    assert(empty == ((0, 0L)) && blank == ((0, 0L)))
    // single-token score is that token's slot weight: bounded by the mix range
    assert(once._2 >= -10L && once._2 <= 10L)
  }

  test("clusterSurvivors: argmax by score, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1), (11L, 0.1),
      (99L, 1.0)) // 99 is unclustered — must not appear
      .toDF("doc_id", "quality")
    val out = Dedup.clusterSurvivors(docs, clusters, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // cluster 1: docs 2 and 3 tie at 0.9 — smallest id (2) wins
    assert(out.toSeq == Seq((1L, 2L, 0.9, 3L), (10L, 10L, 0.1, 2L)))
  }

  test("bloom: no false negatives, probe-only scan, exact k-bit semantics") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    import org.apache.spark.sql.functions.col
    def hashed(rows: Seq[(Long, String)]) =
      rows.toDF("id", "text").select(col("id"),
        columnOf(graft.plans.WordShingleHashes(
          expressionOf(col("text")), 2, 7)).as("ghash"))
    val test = hashed(Seq((1L, "alpha beta gamma delta")))
    val m = 1 << 12
    val bits = Dedup.bloomFilterBits(test, m, 3)
    // the filter is sparse: 3 grams x 3 probes set at most 9 bits
    assert(bits.map(java.lang.Long.bitCount).sum <= 9)
    val probed = Dedup.bloomProbe(hashed(Seq(
      (1L, "alpha beta gamma delta"),     // identical grams: every one hits
      (2L, "alpha beta unrelated stuff"), // shares the (alpha,beta) gram
      (3L, "zz yy xx ww vv uu"))), bits, m, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(probed(0) == ((1L, 3L, true)))  // no false negatives, ever
    assert(probed(1)._2 >= 1L && probed(1)._3)
    // doc 3 may only hit through a genuine false positive — at 4096 bits
    // with <= 9 set, 5 grams x "all 3 probes set" is overwhelmingly empty
    assert(probed(2)._2 == 0L && !probed(2)._3)
  }

  test("bloom: size guards") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
      .select($"id", org.apache.spark.sql.functions.array().cast("array<long>").as("ghash"))
    intercept[IllegalArgumentException] { Dedup.bloomFilterBits(empty, 1000, 3) }
    intercept[IllegalArgumentException] { Dedup.bloomFilterBits(empty, 1 << 25, 3) }
    intercept[IllegalArgumentException] { Dedup.bloomFilterBits(empty, 1 << 12, 0) }
    // empty protected set: nothing flags
    val bits = Dedup.bloomFilterBits(empty, 1 << 12, 3)
    assert(bits.forall(_ == 0L))
  }

  test("ngramCoverage: shared-gram fractions, loner docs at zero") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d"),   // grams (a b),(b c),(c d)
      (2L, "a b x y"),   // shares (a b) with doc 1
      (3L, "p q r s"))   // shares nothing
      .toDF("id", "text").select(col("id"),
        columnOf(graft.plans.WordShingleHashes(
          expressionOf(col("text")), 2, 7)).as("ghash"))
    val out = Dedup.ngramCoverage(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 1.0 / 3), (2L, 3L, 1L, 1.0 / 3), (3L, 3L, 0L, 0.0)))
  }

  test("tripletMining: hard positive, out-of-bucket negative, reproducible draw") {
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions.signBucket
    // bucket bit 0 = sign of dim 1: ids 0-3 positive (bucket 1), 4-7
    // negative (bucket 0); within a bucket, nearer ids are more similar
    val emb = (0 until 8).map { i =>
      val sign = if (i < 4) 1f else -1f
      (i.toLong, Array(sign * (1f + i * 0.1f), i * 0.01f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.tripletMining(emb, "vec_id", "embedding",
        maxQueryId = 2L, bits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    val bucketOf = emb.select(col("vec_id"), signBucket(col("embedding"), 1).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out.foreach { case (q, pos, cosPos, neg, cosNeg, margin) =>
      // positive shares the anchor's half-space and beats the negative
      assert(bucketOf(pos) == bucketOf(q) && bucketOf(neg) != bucketOf(q))
      assert(cosPos > cosNeg && margin == cosPos - cosNeg)
    }
    // the hash draw is partitioning-independent
    val again = Similarity.tripletMining(emb.repartition(5), "vec_id",
        "embedding", 2L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == out.map(t => (t._1, t._4)).toSet)
  }

  test("tripletMining: a cross-bucket hard positive is never drawn as the negative") {
    // anchor 0's nearest neighbor (id 1, cos ~1) sits across the sign
    // hyperplane — it IS the positive AND an out-of-bucket candidate; the
    // only other out-of-bucket vector (id 3) must be the negative
    val emb = Seq(
      (0L, Array(0.001f, 10f)),   // anchor, bucket 1
      (1L, Array(-0.001f, 10f)),  // near-identical, bucket 0 -> hard positive
      (2L, Array(10f, 0.1f)),     // bucket 1, dissimilar
      (3L, Array(-10f, 0.2f)))    // bucket 0, dissimilar
      .toDF("vec_id", "embedding")
    val out = Similarity.tripletMining(emb, "vec_id", "embedding",
        maxQueryId = 1L, bits = 1)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(out == Seq((1L, 3L)))
  }

  test("knnLsh: only same-bucket candidates are scored") {
    val emb = Seq(
      (0L, Array(1.0f, 1.0f)),    // bucket 11
      (1L, Array(1.0f, 1.0f)),    // bucket 11
      (2L, Array(-1.0f, -1.0f))   // bucket 00 — invisible to query 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnLsh(emb, "vec_id", "embedding", 1L, 2, 5)
      .collect().map(r => r.getAs[Long]("n_id"))
    assert(out.toList == List(1L))
  }
}
