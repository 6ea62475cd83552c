package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev microbenchmark for the bucket-skew census+tile guard on the
  * fixed-band self-joins (`Dedup.simhashPairs` / `Dedup.hammingPairs`) —
  * the driver's query corpora cannot produce degenerate buckets for these
  * operators (q23's simhash buckets spread with the Heaps-law vocabulary;
  * q71's md5-derived codes have ~uniform bands), so the straggler case is
  * measured here on purpose-built adversarial corpora. The corpora are
  * designed so the degenerate buckets hold mostly REJECTED candidates
  * (the r11 LSH straggler shape: huge Σ|bucket|², small true-pair
  * output) — a block of identical documents would instead measure a
  * quadratic TRUE pair set, which no task layout can fix:
  *
  *  - simhash: 30% of the corpus is a boilerplate template with THREE
  *    positions mutated per doc (positions id, id+7, id+14 mod
  *    |template|; variants id%97, id%89, id%83). Three swaps flip only a
  *    handful of weak-vote fingerprint bits, so a large sub-block still
  *    agrees with the template on at least one 12-bit band (degenerate
  *    buckets of thousands) — but two docs differ in up to six swapped
  *    positions, putting their mutual hamming past maxHamming=4, so the
  *    rerank rejects the bulk. (A single mutation per doc leaves pairs
  *    within hamming 4 — 208M TRUE pairs at 125k docs, a quadratic
  *    output no task layout can fix; that corpus measures data density,
  *    not the guard.)
  *  - hamming: a 6k-doc block of 32-char codes sharing a 28-char
  *    constant prefix with 4 hash-random suffix chars — the two
  *    pigeonhole bands inside the prefix are block-wide buckets (the
  *    operator scaladoc's degenerate case), and only suffix pairs within
  *    hamming 2 survive the rerank. The other docs carry uniform random
  *    codes (healthy buckets).
  *
  * Times each operator with tile = false (the pre-round-12 join shape)
  * and tile = true (census+tile guard) and asserts the pair COUNTS match,
  * so the printed speedup is for an identical answer. One JSON line,
  * recorded in BASELINE.md.
  *
  * Usage: `SPARK_GRAFT_SKEW_DOCS=125000 sbt "runMain graft.SkewBench"`.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "125000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // materialize the synthetic corpora once so generation cost is not
    // timed with the joins
    def persisted(df: DataFrame): DataFrame = {
      val p = df.persist(); p.count(); p
    }

    // ── simhash corpus: 30% three-mutation boilerplate, 70% spread ──────
    val tmpl = ("the quick brown fox jumps over the lazy dog while the " +
      "merge job sorts every row batch into the wide table tonight").split(" ")
    val mutated = concat_ws(" ", tmpl.indices.map { j =>
      when(pmod(col("id"), lit(tmpl.length)) === j,
        concat(lit("vara"), pmod(col("id"), lit(97)).cast("string")))
        .when(pmod(col("id") + 7, lit(tmpl.length)) === j,
          concat(lit("varb"), pmod(col("id"), lit(89)).cast("string")))
        .when(pmod(col("id") + 14, lit(tmpl.length)) === j,
          concat(lit("varc"), pmod(col("id"), lit(83)).cast("string")))
        .otherwise(lit(tmpl(j)))
    }: _*)
    val vocab = Seq("join", "hash", "row", "batch", "scan", "customer",
      "column", "filter", "small", "merge", "slow", "order", "vector",
      "line", "data", "agg", "value", "key", "stream", "window")
    val vocabCol = array(vocab.map(lit): _*)
    val spread = concat_ws(" ", (0 until 12).map(j =>
      element_at(vocabCol,
        (pmod(hash(col("id") * 31 + j), lit(vocab.size)) + 1).cast("int"))): _*)
    val docs = persisted(spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 3, mutated).otherwise(spread).as("text")))

    // ── hamming corpus: 6k shared-prefix block + uniform random codes ───
    val blockSize = math.min(6000L, nDocs.toLong / 2)
    val hexCol = lit("0123456789abcdef")
    def hexAt(e: org.apache.spark.sql.Column) =
      substring(hexCol, (pmod(e, lit(16)) + 1).cast("int"), lit(1))
    val prefixCode = concat((Seq(lit("a" * 28)) ++ (0 until 4).map(k =>
      hexAt(shiftright(hash(col("id") * 13), k * 4)))): _*)
    val randomCode = concat((0 until 8).map(k =>
      concat(hexAt(shiftright(hash(col("id") * 17 + k), 0)),
        hexAt(shiftright(hash(col("id") * 17 + k), 8)),
        hexAt(shiftright(hash(col("id") * 17 + k), 16)),
        hexAt(shiftright(hash(col("id") * 17 + k), 24)))): _*)
    val codes = persisted(spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      when(col("id") < blockSize, prefixCode).otherwise(randomCode)
        .as("code")))

    def time(name: String, df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.OperatorCaches.releaseAll()
      System.err.println(f"[skewbench] $name%-22s $dt%8.2f s  pairs=$n")
      (dt, n)
    }

    val (shUntiled, shPairsU) = time("simhash untiled",
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 4,
        tile = false))
    val (shTiled, shPairsT) = time("simhash tiled",
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 4,
        tile = true))
    require(shPairsU == shPairsT,
      s"simhash tiled pair count $shPairsT != untiled $shPairsU")

    val (hamUntiled, hamPairsU) = time("hamming untiled",
      graft.operators.Dedup.hammingPairs(codes, "doc_id", "code",
        maxHamming = 2, tile = false))
    val (hamTiled, hamPairsT) = time("hamming tiled",
      graft.operators.Dedup.hammingPairs(codes, "doc_id", "code",
        maxHamming = 2, tile = true))
    require(hamPairsU == hamPairsT,
      s"hamming tiled pair count $hamPairsT != untiled $hamPairsU")

    def fmt(d: Double) = f"$d%.2f"
    println(s"""{"metric":"skewbench","docs":$nDocs,""" +
      s""""simhash_untiled":${fmt(shUntiled)},"simhash_tiled":${fmt(shTiled)},""" +
      s""""simhash_pairs":$shPairsT,""" +
      s""""hamming_untiled":${fmt(hamUntiled)},"hamming_tiled":${fmt(hamTiled)},""" +
      s""""hamming_pairs":$hamPairsT}""")
    spark.stop()
  }
}
