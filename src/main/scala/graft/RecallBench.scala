package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbenchmark: ANN recall@k vs nprobe for the three artifact
  * serve paths — ivfflat (exact cosine within probed cells), ivfpq (ADC
  * over the probed cells' codes), and the two-stage production search
  * (ADC shortlist → exact rerank) — against brute-force ground truth on
  * the SAME query batch.
  *
  * Run on TWO corpora to bracket reality (`SPARK_GRAFT_ANN_TABLE`):
  *
  *  - `embeddings.parquet` — hash-UNIFORM: the adversarial FLOOR for
  *    IVF (no cluster structure for cells to capture; recall ≈ the probe
  *    hit rate ≈ nprobe/cells for ivfflat).
  *  - `embeddings_clustered.parquet` — a seeded 256-component
  *    Gaussian-mixture (scripts/gen_scale.py `gen_clustered`): the
  *    representative shape real embedding spaces have, where a query's
  *    true neighbors share its mixture component and the coarse
  *    quantizer's cells track the components — recall at small nprobe is
  *    governed by how often a neighbor's cell is among the query's
  *    nearest nprobe centroids, not by the uniform floor.
  *
  * The two curves, side by side, are what justify a default-nprobe
  * recommendation (BASELINE.md round-15 table): tuning nprobe on the
  * uniform floor would demand 32+ probes for recall the clustered
  * corpus reaches at 1-2.
  *
  * Both tiers are built from ONE shared coarse fit
  * (`buildIvfPqIndexWith` — the q162 production shape), so the flat and
  * compressed serves agree on every cell boundary and the comparison
  * isolates QUANTIZATION loss (ADC) and its repair (rerank), not fit
  * variance.
  *
  * Usage:
  *   SPARK_GRAFT_ANN_CORPUS=/tmp/x25 \
  *   SPARK_GRAFT_ANN_TABLE=embeddings_clustered.parquet \
  *   sbt "runMain graft.RecallBench"
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val corpusDir = sys.env.getOrElse("SPARK_GRAFT_ANN_CORPUS", "/tmp/x25")
    val table = sys.env.getOrElse("SPARK_GRAFT_ANN_TABLE",
      "embeddings_clustered.parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .appName("graft-recall")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Clustering, Similarity}

    val emb = spark.read.parquet(s"$corpusDir/$table")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val kCoarse = 1 << Similarity.quadBitsFor(n, 16)
    // kPq=16 is the oracle-tractable toy codebook the queries use;
    // SPARK_GRAFT_ANN_PQK=256 measures the production 8-bit-per-subspace
    // Faiss shape (quantization error shrinks ~16x per subspace)
    val kPq = sys.env.get("SPARK_GRAFT_ANN_PQK").map(_.toInt).getOrElse(16)
    val (dim, m, iters) = (64, 8, 2)
    val (maxQ, topK) = (50L, 10)
    val pool = sys.env.get("SPARK_GRAFT_ANN_POOL").map(_.toInt).getOrElse(100)

    // one shared coarse fit for both tiers (the q162 shape)
    val tFlat = System.nanoTime()
    val flat = Clustering.buildIvfFlatIndex(emb, "vec_id", "embedding", kCoarse)
    flat.postings.write.format("noop").mode("overwrite").save()
    val flatBuildSec = (System.nanoTime() - tFlat) / 1e9
    val pq = Clustering.buildIvfPqIndexWith(emb, "vec_id", "embedding",
      dim, m, kPq, iters, flat.lanes)
    // the two-level coarse quantizer at the SAME composed cell count:
    // kA·kB == kCoarse, fit+assign cost n·(kA+kB) instead of n·kCoarse
    val bits = Similarity.quadBitsFor(n, 16)
    val (kA, kB) = (1 << ((bits + 1) / 2), 1 << (bits / 2))
    val tImi = System.nanoTime()
    val imi = Clustering.buildImiIndex(emb, "vec_id", "embedding",
      dim, kA, kB)
    imi.postings.write.format("noop").mode("overwrite").save()
    val imiBuildSec = (System.nanoTime() - tImi) / 1e9

    // ground truth: exact cosine top-k for the same query batch; the
    // corpus side is parameterized so the FILTERED-serve row can score
    // against subset-restricted truth with the same queries
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{scaled, vnorm, cosineFromNorms}
    def exactTruth(corpus: org.apache.spark.sql.DataFrame)
        : Map[Long, Set[Long]] = {
      val sc = corpus.select(col("vec_id").as("n_id"),
          scaled(col("embedding")).as("nv"))
        .withColumn("nn", vnorm(col("nv")))
      val qs = emb.filter(col("vec_id") < maxQ)
        .select(col("vec_id").as("q_id"), scaled(col("embedding")).as("qv"))
        .withColumn("qn", vnorm(col("qv")))
      sc.join(broadcast(qs), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosineFromNorms(col("qv"), col("nv"), col("qn"), col("nn"))
            .as("cos"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)))
        .filter(col("rank") <= topK)
        .select(col("q_id"), col("n_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
    }
    // unfiltered truth reuses the engine's own exact-knn definition
    // (scoring/tie-breaks can never drift from what the engine calls
    // exact); exactTruth exists only for the corpus-RESTRICTED variant
    val truth = Similarity.knnExact(emb, "vec_id", "embedding", maxQ, topK)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    def recallAgainst(df: org.apache.spark.sql.DataFrame,
                      t: Map[Long, Set[Long]]): Double = {
      val got = df.select(col("q_id"), col("n_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
      val per = t.map { case (q, ts) =>
        got.get(q).map(g => (g intersect ts).size.toDouble / ts.size)
          .getOrElse(0.0) }
      per.sum / t.size
    }
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      recallAgainst(df, truth)

    // FILTERED serve (predicate+vector): truth restricted to the
    // matching subset. The claim under measure: pre-filtering INSIDE
    // the probed scan (serveIvfFlatFiltered) beats the naive
    // rank-then-filter compose, whose top-k loses every slot a
    // non-matching neighbor crowded out.
    val attEmb = emb.withColumn("att", pmod(col("vec_id"), lit(4L)))
    val flatAtt = Clustering.buildIvfFlatIndex(attEmb, "vec_id",
      "embedding", kCoarse, attrCols = Seq("att"))
    val truthF = exactTruth(emb.filter(pmod(col("vec_id"), lit(4L)) === 0))
    val npF = 4
    val rFilterPre = recallAgainst(Clustering.serveIvfFlatFiltered(
      flatAtt, emb, "vec_id", "embedding", maxQ, npF, topK,
      col("att") === 0), truthF)
    val rFilterPost = recallAgainst(Clustering.serveIvfFlat(
      flatAtt, emb, "vec_id", "embedding", maxQ, npF, topK)
      .filter(pmod(col("n_id"), lit(4L)) === 0), truthF)
    System.err.println(
      f"filtered(att=0, nprobe=$npF) pre=$rFilterPre%.3f post=$rFilterPost%.3f")

    // DRIFT + REBUILD: train the codebook on one half-space (first
    // coordinate < 0), ADD the other half as a drifted delta — no cell
    // tracks the unseen region, so recall sags; rebuildIvfFlatIndex
    // (retrain from the index's own postings) must recover it to the
    // fresh-fit level.
    val firstCoord = element_at(col("embedding"), 1)
    val stale = Clustering.updateIvfFlatIndex(
      Clustering.buildIvfFlatIndex(emb.filter(firstCoord < 0f),
        "vec_id", "embedding", kCoarse),
      emb.filter(firstCoord >= 0f), "vec_id", "embedding")
    val rStale = recallOf(Clustering.serveIvfFlat(stale, emb,
      "vec_id", "embedding", maxQ, npF, topK))
    val tReb = System.nanoTime()
    val rebuilt = Clustering.rebuildIvfFlatIndex(stale, kCoarse)
    rebuilt.postings.write.format("noop").mode("overwrite").save()
    val rebuildSec = (System.nanoTime() - tReb) / 1e9
    val rRebuilt = recallOf(Clustering.serveIvfFlat(rebuilt, emb,
      "vec_id", "embedding", maxQ, npF, topK))
    System.err.println(f"drift(nprobe=$npF) stale=$rStale%.3f " +
      f"rebuilt=$rRebuilt%.3f (rebuild $rebuildSec%.1f s)")

    // the compressed-flat tier: no nprobe axis (sq scans everything),
    // one number isolating pure 8-bit per-lane quantization loss +
    // the symmetric-L2-vs-cosine metric skew
    val rSq = recallOf(Clustering.serveSq(
      Clustering.buildSqIndex(emb, "vec_id", "embedding", dim),
      emb, "vec_id", "embedding", maxQ, topK))
    System.err.println(f"sq(flat)=$rSq%.3f")
    // composed IVF×SQ on the SAME coarse fit as flat/pq: its by-nprobe
    // recall should track min(ivfflat probe recall, sq's flat ceiling) —
    // per-lane codes keep the in-cluster ordering m-subspace ADC loses
    val ivfsq = Clustering.buildIvfSqIndexWith(emb, "vec_id", "embedding",
      dim, flat.lanes)
    // RESIDUAL-encoded IVFPQ on the same fit: same m bytes/vector as
    // the raw-vector ADC column — the paired comparison that isolates
    // what residual encoding buys inside tight clusters
    val pqr = Clustering.buildIvfPqrIndexWith(emb, "vec_id", "embedding",
      dim, m, kPq, iters, flat.lanes)

    val nprobes = Seq(1, 2, 4, 8, 16, 32)
    val rows = nprobes.map { np =>
      val rFlat = recallOf(Clustering.serveIvfFlat(flat, emb,
        "vec_id", "embedding", maxQ, np, topK))
      val rAdc = recallOf(Clustering.serveIvfPq(pq, emb,
        "vec_id", "embedding", dim, m, maxQ, np, topK))
      val rTwo = recallOf(Clustering.serveIvfPqRerank(pq, flat.postings,
        emb, "vec_id", "embedding", dim, m, maxQ, np, pool, topK))
      val rImi = recallOf(Clustering.serveImi(imi, emb,
        "vec_id", "embedding", maxQ, np, topK))
      val rIvfSq = recallOf(Clustering.serveIvfSq(ivfsq, emb,
        "vec_id", "embedding", maxQ, np, topK))
      val rPqr = recallOf(Clustering.serveIvfPqr(pqr, emb,
        "vec_id", "embedding", dim, m, maxQ, np, topK))
      // rerank over the RESIDUAL shortlist at the same pool: the more
      // accurate shortlist should need a smaller pool to recover the
      // flat tier's recall (the q174 claim, measured)
      val rTwoPqr = recallOf(Clustering.serveIvfPqrRerank(pqr,
        flat.postings, emb, "vec_id", "embedding", dim, m, maxQ, np,
        pool, topK))
      System.err.println(f"nprobe=$np%-3d ivfflat=$rFlat%.3f adc=$rAdc%.3f " +
        f"rerank=$rTwo%.3f imi=$rImi%.3f ivfsq=$rIvfSq%.3f pqr=$rPqr%.3f " +
        f"rerank_pqr=$rTwoPqr%.3f")
      s""""$np":{"ivfflat":$rFlat,"ivfpq_adc":$rAdc,"rerank":$rTwo,""" +
        s""""imi":$rImi,"ivfsq":$rIvfSq,"ivfpqr_adc":$rPqr,""" +
        s""""rerank_pqr":$rTwoPqr}"""
    }
    println(s"""{"metric":"ann_recall","table":"$table","n":$n,""" +
      s""""cells":$kCoarse,"imi_ka":$kA,"imi_kb":$kB,"queries":$maxQ,""" +
      s""""topk":$topK,"pq_k":$kPq,"rerank_pool":$pool,""" +
      s""""flat_build_sec":${f"$flatBuildSec%.2f"},""" +
      s""""imi_build_sec":${f"$imiBuildSec%.2f"},""" +
      s""""sq_flat_recall":${f"$rSq%.3f"},""" +
      s""""filtered_pre":${f"$rFilterPre%.3f"},""" +
      s""""filtered_post":${f"$rFilterPost%.3f"},""" +
      s""""drift_stale":${f"$rStale%.3f"},""" +
      s""""drift_rebuilt":${f"$rRebuilt%.3f"},""" +
      s""""rebuild_sec":${f"$rebuildSec%.2f"},""" +
      s""""by_nprobe":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
