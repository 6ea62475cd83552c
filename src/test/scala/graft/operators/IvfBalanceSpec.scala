package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reason the coarse IVF quantizer is TRAINED (k-means) instead of
  * the fixed rule "centroids = vectors with id < numCentroids": on a
  * corpus whose low-id vectors are correlated — the common case when ids
  * encode ingestion order and early batches came from one source — fixed
  * centroids are near-duplicates of each other, cosine ties collapse to
  * the lowest centroid id, and ONE inverted list absorbs the corpus. The
  * per-query cost contract (≈ n·nprobe/numCentroids) silently becomes a
  * full scan; at 100 TB that is the difference between a sublinear index
  * and an outage. Training spreads the codebook over the data, bounding
  * max-cell occupancy near n/k.
  */
class IvfBalanceSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val N = 320

  /** Skewed corpus: ids 0..K-1 (the would-be fixed centroids) all sit in
    * ONE tight blob; the remaining vectors spread evenly over 8 distinct
    * orthogonal-ish directions. Dim 16. */
  private def skewed = {
    val rows = (0 until N).map { i =>
      val base = Array.fill(16)(0f)
      if (i < K) {
        base(0) = 10f + i * 0.001f // near-identical low-id vectors
      } else {
        val blob = i % 8
        base(blob * 2) = 10f + (i / 8) * 0.01f
        base(blob * 2 + 1) = 1f
      }
      (i.toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
  }

  private def maxCell(cents: graft.plans.IvfCentroids): (Long, Int) = {
    val (assigned, _) = Similarity.ivfAssignProbes(
      skewed, "vec_id", "embedding", cents, maxQueryId = 0L, nprobe = 1)
    val occ = assigned.groupBy($"c_id").count().collect().map(_.getLong(1))
    (occ.max, occ.length)
  }

  test("fixed-id centroids degenerate on a skewed corpus (the motivation)") {
    val fixed = Similarity.centroidSet(
      skewed.filter($"vec_id" < K), "vec_id", "embedding")
    val (worst, _) = maxCell(fixed)
    // all K fixed centroids point the same way -> ties collapse and the
    // non-blob majority crowds into a handful of lists
    assert(worst >= N / 2,
      s"expected a degenerate cell >= ${N / 2}, got $worst")
  }

  test("trained coarse quantizer keeps max-cell occupancy <= 4*n/k") {
    val trained = Clustering.ivfCoarseCentroids(
      skewed, "vec_id", "embedding", K, iters = 3)
    val (worst, cells) = maxCell(trained)
    assert(cells > 1, "training collapsed to a single cell")
    assert(worst <= 4L * N / K,
      s"max cell $worst exceeds 4*n/k = ${4L * N / K} over $cells cells")
  }
}
