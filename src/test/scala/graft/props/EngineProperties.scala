package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.dml.Dml
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.queries.Num

/** Property-based checks (scalacheck) for the semantics that must hold on
  * ANY input, not just the fixtures: DML masking vs a plain-Scala
  * reference model, LSH guaranteed-recall on exact duplicates, and
  * order-independence of the decimal-exact aggregation. */
object EngineProperties extends Properties("graft") {

  // keep the case count modest: every case runs real Spark jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cellGen = for {
    eid <- Gen.choose(1L, 4L)
    fam <- Gen.oneOf("info", "stats")
    qual <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(1L, 50L)
  } yield (eid, fam, qual, ts, s"v$ts")

  private val deleteGen = for {
    eid <- Gen.choose(1L, 4L)
    fam <- Gen.oneOf("info", "stats")
    qual <- Gen.oneOf("a", "b", "c")
    upTo <- Gen.choose(1L, 60L)
    op <- Gen.oneOf("delete_cell", "delete_column", "delete_family", "delete_row")
  } yield (eid, fam, qual, op, upTo)

  /** Plain-Scala reference model of the HBase tombstone semantics. */
  private def masked(cell: (Long, String, String, Long, String),
                     d: (Long, String, String, String, Long)): Boolean = {
    val (eid, fam, qual, ts, _) = cell
    val (dEid, dFam, dQual, op, dTs) = d
    eid == dEid && (op match {
      case "delete_row" => ts <= dTs
      case "delete_family" => fam == dFam && ts <= dTs
      case "delete_column" => fam == dFam && qual == dQual && ts <= dTs
      case "delete_cell" => fam == dFam && qual == dQual && ts == dTs
    })
  }

  property("applyChanges matches the reference tombstone model") =
    forAll(Gen.listOfN(12, cellGen), Gen.listOfN(3, deleteGen)) { (cells, dels) =>
      val cellsDf = cells.toDF("entity_id", "family", "qualifier", "ts", "value")
      val delsDf = dels.map { case (e, f, q, op, t) =>
        (e, f, q, op, t, null.asInstanceOf[String])
      }.toDF("entity_id", "family", "qualifier", "op", "ts", "value")
      val got = Dml.applyChanges(cellsDf, delsDf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getString(4))).toSeq.sorted
      val want = cells.filterNot(c => dels.exists(d => masked(c, d))).sorted
      got == want
    }

  property("exact duplicates are ALWAYS found by minhash LSH (all bands match)") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.take(8))) { words =>
      val text = (words ++ words ++ words).mkString(" ") // >= 3 tokens
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val grams = docs.select($"doc_id".as("id"),
        array_distinct(shingles($"text", 3)).as("grams"))
      val pairs = Dedup.minhashLshPairs(grams, 16, 4, 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      pairs.toList == List((1L, 2L, 1.0))
    }

  property("dsum is partition-order independent and decimal-exact") =
    forAll(Gen.listOfN(40, Gen.choose(-99999L, 99999L).map(_ / 100.0))) { xs =>
      xs.isEmpty || {
        val expected = xs.map(BigDecimal(_)).sum.toDouble
        val one = xs.toDF("x").repartition(1).agg(Num.dsum($"x")).head().getDouble(0)
        val many = xs.toDF("x").repartition(7).agg(Num.dsum($"x")).head().getDouble(0)
        one == expected && many == expected
      }
    }

  property("simhash of identical texts is identical; hamming 0 pair found") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("red", "green", "blue", "cyan"))
        .map(_.take(6))) { words =>
      val text = words.mkString(" ")
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      pairs.toList == List((1L, 2L, 0))
    }

  // ── native hash kernels ≡ the composed-functions formulas they replace ──

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.oneOf("ému", "势", "a b", "", "\t")))
    .map(_.mkString(" ")).map(_.take(60))

  // CDC boundary text gen biases toward the kernel's edge cases: texts
  // shorter than the W=16 window (no eligible cut — only the final end),
  // texts of EXACTLY W (first eligible position == last), multi-byte
  // UTF-8 and ASTRAL code points (code-point counting, not UTF-16
  // units), and long runs that actually fire content cuts.
  private val cdcTextGen: Gen[String] = Gen.frequency(
    3 -> Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),       // < W
    2 -> Gen.listOfN(16, Gen.alphaNumChar).map(_.mkString),    // == W
    3 -> Gen.choose(17, 120).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),       // > W
    3 -> Gen.choose(4, 60).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "é", "ü", "势", "界", "😀", "𝄞", "a", "b", " ")).map(_.mkString)))

  property("CdcBoundaries == plain-Scala window-sum model (incl. <W, ==W, astral)") =
    forAll(Gen.listOfN(6, cdcTextGen), Gen.oneOf(4, 16, 32)) { (ss, mask) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      // the ORACLE's formulation: direct Σ c·B^d window sums with each
      // term reduced mod 2^40 (never a rolling state), over CODE POINTS
      def model(s: String): Seq[Int] = {
        val w = graft.plans.CdcBoundaries.W
        val m = graft.plans.CdcBoundaries.Mod
        val pows = Iterator.iterate(1L)(p =>
          (p * graft.plans.CdcBoundaries.B) & (m - 1)).take(w).toArray
        val cps = s.codePoints().toArray
        val cuts = (w to cps.length).filter { i =>
          val fp = (0 until w).map(d =>
            (cps(i - 1 - d).toLong * pows(d)) & (m - 1)).sum % m
          fp % mask == 0
        }
        if (cps.isEmpty) Seq.empty
        else if (cuts.nonEmpty && cuts.last == cps.length) cuts
        else cuts :+ cps.length
      }
      val got = ss.toDF("text")
        .select(columnOf(graft.plans.CdcBoundaries(
          expressionOf($"text"), mask)).as("e"))
        .collect().map(_.getSeq[Int](0).toList)
      got.zip(ss.map(model)).forall { case (k, b) => k == b.toList }
    }

  property("Md5PrefixLong == conv(substring(md5(utf8)))") =
    forAll(Gen.listOfN(6, textGen), Gen.oneOf(7, 8, 15)) { (ss, nibbles) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      import org.apache.spark.sql.types.{BinaryType, LongType}
      val df = ss.toDF("s")
      val legacy = conv(substring(md5($"s".cast(BinaryType)), 1, nibbles), 16, 10)
        .cast(LongType)
      val native = columnOf(graft.plans.Md5PrefixLong(expressionOf($"s"), nibbles))
      df.select(legacy.as("l"), native.as("n"))
        .collect().forall(r => r.getLong(0) == r.getLong(1))
    }

  property("Md5ArrayLong(distinctSorted) == array_sort∘array_distinct∘transform(hash)") =
    forAll(Gen.listOfN(4, Gen.listOf(Gen.oneOf("a", "bb", "ccc", "a", "")))) { lists =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      import org.apache.spark.sql.types.{BinaryType, LongType}
      val df = lists.map(Tuple1(_)).toDF("grams")
      val legacy = array_sort(array_distinct(transform($"grams", g =>
        conv(substring(md5(g.cast(BinaryType)), 1, 7), 16, 10).cast(LongType))))
      val native = columnOf(graft.plans.Md5ArrayLong(expressionOf($"grams"), 7,
        distinctSorted = true))
      df.select(legacy.as("l"), native.as("n"))
        .collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }

  property("MinhashSignature == k-fold array_min(transform(affine)); empty -> null") =
    forAll(Gen.listOfN(5, Gen.listOf(Gen.choose(0L, (1L << 28) - 1)))) { lists =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val k = 16
      val df = lists.map(Tuple1(_)).toDF("ghash")
      val legacy = array((0 until k).map(j => Dedup.minhashOfHashes($"ghash", j)): _*)
      val native = columnOf(graft.plans.MinhashSignature(expressionOf($"ghash"), k))
      df.select($"ghash", legacy.as("l"), native.as("n")).collect().forall { r =>
        if (r.getSeq[Long](0).isEmpty) r.isNullAt(2) // empty grams -> null sig
        else r.getSeq[Long](1) == r.getSeq[Long](2)
      }
    }

  property("SimhashOfHashes == per-bit aggregate vote fold") =
    forAll(Gen.listOfN(4, Gen.listOf(Gen.choose(0L, (1L << 60) - 1))),
        Gen.oneOf(32, 60)) { (lists, bits) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val df = lists.map(Tuple1(_)).toDF("hs")
      val legacy = Dedup.simhashOfHashes($"hs", bits)
      val native = columnOf(graft.plans.SimhashOfHashes(expressionOf($"hs"), bits))
      df.select(legacy.as("l"), native.as("n"))
        .collect().forall(r => r.getLong(0) == r.getLong(1))
    }

  property("CharGramHashes == hash∘distinct∘charGrams (incl. unicode + short texts)") =
    forAll(Gen.listOfN(5, textGen), Gen.oneOf(2, 4, 8)) { (ss, n) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val df = ss.toDF("s")
      val legacy = columnOf(graft.plans.Md5ArrayLong(
        expressionOf(array_distinct(charGrams($"s", n))), 7, distinctSorted = true))
      val fused = columnOf(graft.plans.CharGramHashes(expressionOf($"s"), n, 7))
      df.select(legacy.as("l"), fused.as("f"))
        .collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }

  property("WordShingleHashes == hash∘distinct∘shingles (split/lower semantics)") =
    forAll(Gen.listOfN(5, textGen), Gen.oneOf(1, 2, 3)) { (ss, n) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val df = ss.toDF("s")
      val legacy = columnOf(graft.plans.Md5ArrayLong(
        expressionOf(array_distinct(shingles($"s", n))), 7, distinctSorted = true))
      val fused = columnOf(graft.plans.WordShingleHashes(expressionOf($"s"), n, 7))
      df.select(legacy.as("l"), fused.as("f"))
        .collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }

  property("HashedNgramBuckets == plain-Scala uni+bigram md5-bucket model") =
    forAll(Gen.listOfN(5, textGen), Gen.oneOf(64, 4096)) { (ss, buckets) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      def model(s: String): Seq[Long] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        def h(f: String): Long = {
          md.reset()
          val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          for (i <- 0 until 7) {
            val b = d(i >> 1) & 0xff
            v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
          }
          v % buckets
        }
        val ws = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        ws.map(h) ++ ws.zip(ws.drop(1)).map { case (a, b) => h(a + " " + b) }
      }
      val df = ss.toDF("s")
      val native = columnOf(graft.plans.HashedNgramBuckets(
        expressionOf($"s"), buckets))
      df.select($"s", native.as("n")).collect()
        .forall(r => r.getSeq[Long](1) == model(r.getString(0)))
    }

  property("BucketWeightSum == sum over the literal weight table") =
    forAll(Gen.listOfN(6, Gen.listOf(Gen.choose(0L, 63L)))) { lists =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val w = Array.tabulate(64)(b => b.toLong * 17L - 100L)
      val df = lists.map(Tuple1(_)).toDF("bs")
      val native = columnOf(graft.plans.BucketWeightSum(expressionOf($"bs"), w))
      df.select($"bs", native.as("n")).collect().forall { r =>
        r.getLong(1) == r.getSeq[Long](0).map(b => w(b.toInt)).sum
      }
    }

  property("thresholded sorted_intersect_size drops exactly the sub-threshold pairs") =
    forAll(Gen.listOfN(8,
        for {
          // at least one side non-empty: the pipeline never reranks
          // empty-vs-empty (empty gram sets get null band keys), and
          // 0/0 would trip ANSI division
          a <- Gen.nonEmptyListOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
          b <- Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
        } yield (a, b)),
      Gen.oneOf(0.3, 0.5, 0.8, 1.0)) { (pairs, t) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      import org.apache.spark.sql.types.DoubleType
      val df = pairs.toDF("a", "b")
      def jac(minJ: Option[Double]) = {
        val inter = columnOf(graft.plans.SortedIntersectSize(
          expressionOf($"a"), expressionOf($"b"), minJ))
        df.select($"a", $"b",
          (inter.cast(DoubleType) / (size($"a") + size($"b") - inter)).as("j"))
          .filter($"j" >= t)
          .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1), r.getDouble(2)))
          .toSet
      }
      jac(None) == jac(Some(t)) // surviving pairs AND their values identical
    }

  property("IVF recall@k is monotone in nprobe and total at nprobe = numCentroids") =
    forAll(Gen.choose(0L, 1L << 30)) { seed =>
      // Synthetic clustered corpus: 3 directional clusters, ids assigned
      // round-robin so the deterministic id<numCentroids centroid choice
      // lands one centroid per cluster. Components stay >= 20 in magnitude
      // so no vector is near the origin (cosine well-defined).
      val rnd = new scala.util.Random(seed)
      val dim = 4
      val clusters = 3
      val n = 24
      val centers = Array.fill(clusters)(Array.fill(dim)(
        (rnd.nextInt(81) + 20) * (if (rnd.nextBoolean()) 1 else -1)))
      val vecs = (0 until n).map { j =>
        val c = centers(j % clusters)
        (j.toLong, c.map(x => x + rnd.nextFloat() * 4f - 2f).toSeq)
      }
      val df = vecs.toDF("id", "vec")
      val k = 3
      val maxQ = 4L
      def topSet(out: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        out.select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = topSet(graft.operators.Similarity.knnExact(df, "id", "vec", maxQ, k))
      val recalls = (1 to clusters).map { np =>
        val approx = topSet(graft.operators.Similarity.knnIvf(
          df, "id", "vec", maxQ, numCentroids = clusters, nprobe = np, k = k))
        approx.intersect(exact).size.toDouble / exact.size
      }
      // probing more lists only ADDS candidates, and a global-top-k member
      // in the candidate set always survives the per-query window — so
      // recall is monotone, and probing every list IS the exact search
      recalls.sliding(2).forall(w => w.head <= w.last) && recalls.last == 1.0
    }

  property("bitsFor keeps bucket population near the target at any corpus size") =
    forAll(Gen.choose(1L, 1L << 40), Gen.choose(1L, 4096L)) { (n, target) =>
      val b = graft.operators.Similarity.bitsFor(n, target)
      val withinCap = b >= 1 && b <= 16
      // smallest b whose 2^b buckets hold <= target rows each (uniformly),
      // unless capped at maxBits
      val tightEnough = b == 16 || n <= (target << b)
      val minimal = b == 1 || n > (target << (b - 1))
      withinCap && tightEnough && minimal
    }

  property("WAV 8-bit codec round-trips header + exact amplitude sum") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 255)),
           Gen.oneOf(8000, 16000, 44100)) { (vals, rate) =>
      val samples = vals.map(_.toByte).toArray
      val (r, c, frames, sum) =
        graft.operators.Multimodal.decodeAudio(
          graft.operators.Multimodal.encodeWav(rate, samples))
      r == rate && c == 1 && frames == samples.length.toLong &&
        sum == vals.map(_.toLong).sum
    }

  property("WAV 16-bit codec round-trips signed samples at any channel split") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)),
           Gen.oneOf(1, 2)) { (vals, channels) =>
      // truncate to a whole number of frames for the chosen channel count
      val usable = vals.take(vals.length / channels * channels)
      usable.isEmpty || {
        val samples = usable.map(_.toShort).toArray
        val (r, c, frames, sum) =
          graft.operators.Multimodal.decodeAudio(
            graft.operators.Multimodal.encodeWav16(8000, samples, channels))
        r == 8000 && c == channels &&
          frames == (samples.length / channels).toLong &&
          sum == usable.map(_.toLong).sum
      }
    }

  property("TokenStats == plain-Scala split/count model on arbitrary text") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.oneOf("the", "a", "B", "xy "), Gen.alphaNumStr.map(_.take(4)),
      Gen.oneOf(" ", "\t", "\n")))) { parts =>
      val text = parts.mkString("")
      val toks = text.toLowerCase.split("\\s+", -1).toSeq
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val grams = toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val row = graft.plans.TokenStats.stats(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4)) ==
        ((toks.size.toLong, counts.size.toLong, counts.values.max,
          grams.size.toLong, grams.distinct.size.toLong))
    }

  property("hammingPairs == brute-force model (guaranteed recall, exact rerank)") =
    forAll(Gen.listOfN(10,
      Gen.listOfN(6, Gen.oneOf('a', 'b')).map(_.mkString))) { strs =>
      val docs = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val got = Dedup.hammingPairs(docs, "id", "s", maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, i) <- strs.zipWithIndex; (b, j) <- strs.zipWithIndex
        if i < j && a.length == b.length
        h = a.zip(b).count { case (x, y) => x != y }
        if h <= 2
      } yield (i.toLong, j.toLong, h)).toSet
      got == want
    }

  /** Driver-side replica of `Sampling.hashBucket` (md5 prefix, 7 hex
    * nibbles, pmod 10000) — the exact lattice the operator hashes into. */
  private def bucketOf(salt: String, id: Long, buckets: Int = 10000): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(7), 16) % buckets).toInt
  }

  property("rebalance: exact multiplicity over the hash lattice, dense copy_idx, growth-stable") =
    forAll(Gen.choose(40, 120), Gen.choose(0.0, 3.0), Gen.choose(0.0, 3.0)) {
      (n, wde, wfr) =>
        import graft.operators.Sampling
        val df = spark.range(0, n.toLong).select($"id",
          when($"id" % 3 === 0, "de").when($"id" % 3 === 1, "fr")
            .otherwise("en").as("lang"))
        val w = Map("de" -> wde, "fr" -> wfr) // en defaults to weight 1
        val got = Sampling.rebalance(df, "lang", "id", w)
          .select("id", "lang", "copy_idx").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        // exact expected multiplicity per id: floor(w) + [bucket < round(frac·10⁴)]
        def copiesOf(id: Long, lang: String): Int = {
          val wt = w.getOrElse(lang, 1.0)
          val frac = wt - math.floor(wt)
          math.floor(wt).toInt +
            (if (bucketOf("rebalance", id) < math.round(frac * 10000).toInt) 1 else 0)
        }
        val perId = got.groupBy(r => (r._1, r._2)).view.mapValues(_.length).toMap
        val exactCount = (0L until n.toLong).forall { id =>
          val lang = if (id % 3 == 0) "de" else if (id % 3 == 1) "fr" else "en"
          perId.getOrElse((id, lang), 0) == copiesOf(id, lang)
        }
        // copy_idx is dense 0..copies-1 within each replicated id
        val dense = got.groupBy(_._1).forall { case (_, g) =>
          g.map(_._3).sorted.toSeq == (0 until g.length)
        }
        // subset stability: restricting the corpus never changes a
        // surviving row's multiplicity (pure per-row hash math)
        val half = Sampling.rebalance(
            df.filter($"id" < n / 2), "lang", "id", w)
          .groupBy("id").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val stable = half.forall { case (id, c) =>
          perId((id, if (id % 3 == 0) "de" else if (id % 3 == 1) "fr" else "en")) == c
        } && perId.keys.filter(_._1 < n / 2).forall(k => half.contains(k._1))
        exactCount && dense && stable
    }

  property("budgetSelect == one-window model at any bandWidth/budget") =
    forAll(Gen.choose(30, 150), Gen.choose(1L, 3000L), Gen.choose(1L, 64L)) {
      (n, budget, bandWidth) =>
        import graft.operators.Sampling
        val df = spark.range(0, n.toLong).select($"id",
          pmod($"id" * 101, lit(37)).as("score"),
          (pmod($"id" * 7, lit(15)) + 1).as("w"))
        val got = Sampling.budgetSelect(df, "score", "id", "w",
            budget, bandWidth)
          .select("id", "cum_w").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        // plain-Scala reference: walk (score desc, id asc), keep while
        // the inclusive running total stays <= budget
        val rows = (0L until n.toLong)
          .map(id => (id, (id * 101) % 37, (id * 7) % 15 + 1))
          .sortBy { case (id, s, _) => (-s, id) }
        var cum = 0L
        val want = scala.collection.mutable.Map[Long, Long]()
        rows.foreach { case (id, _, w) =>
          cum += w; if (cum <= budget) want(id) = cum
        }
        got == want.toMap
    }

  property("temperatureWeights: exact sqrt quantization, weights sum to ~1, targets under budget") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 2000)).map(_.take(6)),
           Gen.choose(0L, 100000L)) { (sizes, budget) =>
      import graft.operators.Sampling
      val df = sizes.zipWithIndex.flatMap { case (sz, i) =>
        Seq.fill(sz)(s"s$i")
      }.toDF("src")
      val out = Sampling.temperatureWeights(df, "src", budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4)))
      val denom = out.map(_._3).sum
      out.forall { case (_, n, ws, wt, tn) =>
        ws == math.floor(math.sqrt(n.toDouble) * (1L << 20)).toLong &&
          wt == ws.toDouble / denom &&
          tn == math.floor(wt * budget).toLong
      } && out.map(_._5).sum <= budget &&
        math.abs(out.map(_._4).sum - 1.0) < 1e-9
    }

  property("funnel == plain-Scala ordered-progression model on arbitrary streams") =
    forAll(Gen.listOfN(60, for {
      user <- Gen.choose(1L, 5L)
      us <- Gen.choose(0L, 40L)
      tpe <- Gen.oneOf("view", "click", "purchase", "noise")
    } yield (user, us, tpe))) { rows =>
      import graft.operators.Temporal
      val stages = Seq("view", "click", "purchase")
      val df = rows.toDF("user_id", "us", "event_type")
        .select($"user_id", timestamp_micros($"us").as("ts"), $"event_type")
      // unix_micros, NOT Timestamp.getTime: the generated timestamps are
      // sub-millisecond apart and getTime floors to millis
      val got = Temporal.funnel(df, "user_id", "ts", "event_type", stages)
        .select($"user_id", $"stage_idx", expr("unix_micros(stage_ts)").as("m"))
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      // model: walk each user's events; stage i's time is the min ts of
      // that type strictly after stage i-1's time
      val want = rows.groupBy(_._1).flatMap { case (user, evs) =>
        stages.zipWithIndex.foldLeft(Seq.empty[((Long, Int), Long)]) {
          case (acc, (st, i)) =>
            val floor = if (i == 0) Long.MinValue
              else acc.lastOption.filter(_._1._2 == i - 1).map(_._2)
                .getOrElse(Long.MaxValue)
            if (floor == Long.MaxValue) acc
            else {
              val ts = evs.filter(e => e._3 == st &&
                (i == 0 || e._2 > floor)).map(_._2)
              if (ts.isEmpty) acc else acc :+ (((user, i), ts.min))
            }
        }
      }
      got == want
    }

  property("int8 quantization: codes bounded, error < amax, zero-safe") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-4.0f, 4.0f)),
           Gen.oneOf(true, false)) { (lanes, zero) =>
      import graft.functions.VectorFunctions._
      val vec = if (zero) lanes.map(_ => 0.0f) else lanes
      val row = Seq(Tuple1(vec)).toDF("embedding")
        .select(scaled($"embedding").as("iv"))
        .withColumn("amax", amaxInt($"iv"))
        .withColumn("codes", int8Codes($"iv", $"amax"))
        .select($"amax", $"codes",
          maxQuantErr($"iv", $"codes", $"amax").as("maxerr"))
        .collect().head
      val amax = row.getLong(0)
      val codes = row.getSeq[Long](1)
      val maxerr = row.getLong(2)
      codes.forall(q => q >= -127L && q <= 127L) &&
        (if (amax == 0) codes.forall(_ == 0L) && maxerr == 0L
         // trunc error is < 1 code unit, i.e. |127·x − q·amax| < amax
         else maxerr < amax)
    }

  property("CMS point estimates NEVER undercount (deliberate collisions)") =
    forAll(Gen.listOfN(60, Gen.choose(0, 30))) { xs =>
      import graft.operators.Sketches
      // w=64 on ~30 distinct items forces counter sharing: estimates may
      // overcount (that is the sketch's one-sided error) but an estimate
      // below the true count is a broken sketch on ANY input.
      val items = xs.map(i => s"item$i").toDF("item")
      val counters = Sketches.cmsCounters(items, "item", d = 4, w = 64)
      val est = Sketches.cmsQuery(counters, items.distinct(), "item", d = 4, w = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val truth = xs.groupBy(identity).map { case (k, v) => (s"item$k", v.size.toLong) }
      truth.forall { case (k, n) => est(k) >= n }
    }

  property("HLL raw estimate within 3 sigma of truth for n >= 2.5m (m=4096)") =
    forAll(Gen.choose(11000, 30000)) { n =>
      import graft.operators.Sketches
      // the raw estimator (no small-range correction) is only claimed
      // above ~2.5m distinct values; standard error is 1.04/sqrt(m)
      val df = spark.range(n)
        .select(concat(lit("v"), col("id")).as("v"), lit(1).as("g"))
      val est = Sketches.hllEstimate(df, Seq("g"), "v")
        .collect().head.getAs[Double]("hll_est")
      math.abs(est - n) / n <= 3 * 1.04 / 64
    }

  property("BPE trainer's run-parity windows == sequential greedy kernel on any corpus") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(6,
        Gen.oneOf('a', 'b', 'c')).map(_.mkString)).map(_.take(5)),
        Gen.choose(1, 5)) { (words, merges) =>
      import graft.operators.Bpe
      import graft.plans.BpeDocStats
      // q97's shared-oracle proof rests on this equivalence; the 3-char
      // alphabet maximizes identical-pair runs (aaa...) where the two
      // formulations could plausibly diverge
      val wf = words.distinct.map(w => (w, 1L)).toDF("word", "freq")
      val (induced, toks) = Bpe.train(wf, merges)
      val lhs = induced.map(_.lhs).toArray
      val rhs = induced.map(_.rhs).toArray
      val trained = toks.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      trained.forall { case (w, expect) =>
        BpeDocStats.encode(w, lhs, rhs).toSeq == expect
      }
    }

  property("BPE trainLocal == distributed train: merges and token table") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(6,
        Gen.oneOf('a', 'b', 'c')).map(_.mkString)).map(_.take(5)),
        Gen.choose(1, 5)) { (words, merges) =>
      import graft.operators.Bpe
      // the driver-local merge loop must be indistinguishable from the
      // windowed distributed trainer — same argmax tie-breaks, same
      // leftmost-greedy application, same exhaustion — or trainAuto's
      // routing would silently change query results with corpus size.
      // Non-uniform freqs exercise the weighted argmax.
      val wf = words.distinct.map(w => (w, (w.length % 3 + 1).toLong))
        .toDF("word", "freq")
      def toksOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val (mDist, tDist) = Bpe.train(wf, merges)
      val (mLoc, tLoc) = Bpe.trainLocal(wf, merges)
      mDist == mLoc && toksOf(tDist) == toksOf(tLoc)
    }

  property("pqCodes codes every vector with bounded codes, even when k exceeds the distinct subvectors") =
    forAll(Gen.choose(1, 5), Gen.choose(2, 8)) { (distinctVals, k) =>
      import graft.operators.Clustering
      // subspace values from a tiny alphabet: most of the k clusters
      // empty out, but every vector must still carry a code in [0, k)
      // with a nonnegative exact error
      val rows = (0 until 12).map(i =>
        (i.toLong, Seq.fill(4)((i % distinctVals).toFloat)))
      val df = rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val out = Clustering.pqCodes(df, "vec_id", "embedding",
        dim = 4, m = 2, k = k, iters = 2).collect()
      out.length == 12 && out.map(_.getLong(0)).distinct.length == 12 &&
        out.forall { r =>
          val (c0, e0, c1, e1) =
            (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))
          c0 >= 0 && c0 < k && c1 >= 0 && c1 < k && e0 >= 0L && e1 >= 0L
        }
    }

  property("NearestL2Centroid kernel == plain-Scala argmin with smallest-id ties") =
    forAll(
      Gen.choose(1, 6),                                   // centroid count
      Gen.choose(1, 5),                                   // dim
      Gen.choose(1, 3),                                   // value alphabet (forces ties)
      Gen.choose(0L, 1000L)) { (k, dim, vals, seed) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      def v(i: Long, j: Int): Long =
        math.floorMod(i * 2654435761L + j * 40503L + seed, vals.toLong)
      // non-contiguous ids (clusters 0,2,4,... as if odd ones emptied out)
      val ids = (0 until k).map(_ * 2)
      val flat = (for (c <- 0 until k; j <- 0 until dim)
        yield v(c + 100, j)).toArray
      val cents = graft.plans.L2Centroids(ids.toArray, flat, dim)
      (0 until 8).forall { r =>
        val vec = (0 until dim).map(j => v(r, j)).toArray
        val got = graft.plans.L2Centroids.nearest(
          new GenericArrayData(vec), cents)
        val dists = (0 until k).map { c =>
          (0 until dim).map { j =>
            val t = vec(j) - flat(c * dim + j); t * t
          }.sum
        }
        val bestD = dists.min
        val bestC = ids(dists.indexOf(bestD)) // first index = smallest id
        got.getLong(0) == bestD && got.getInt(1) == bestC
      }
    }

  property("GroupedL2Seeds.nearest == per-group argmin with smallest-svid ties") =
    forAll(
      Gen.choose(1, 5),                                   // groups
      Gen.choose(1, 4),                                   // max seeds per group
      Gen.choose(1, 4),                                   // dim
      Gen.choose(1, 3),                                   // value alphabet (forces ties)
      Gen.choose(0L, 1000L)) { (ng, maxSeeds, dim, vals, seed) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      def v(i: Long, j: Int): Long =
        math.floorMod(i * 2654435761L + j * 40503L + seed, vals.toLong)
      // deterministic per-group seed counts >= 1; svids ascending within
      // a group (the builder sorts by (ccell, svid))
      val counts = (0 until ng).map(g => 1 + (math.floorMod(seed + g, maxSeeds.toLong)).toInt)
      val start = counts.scanLeft(0)(_ + _).toArray
      val total = start.last
      val svids = (0 until total).map(i => i.toLong * 3 + 7).toArray
      val flat = (for (i <- 0 until total; j <- 0 until dim)
        yield v(i + 500, j)).toArray
      val gs = graft.plans.GroupedL2Seeds(start, svids, flat, dim)
      (0 until 8).forall { r =>
        val vec = (0 until dim).map(j => v(r, j)).toArray
        (0 until ng).forall { g =>
          val got = graft.plans.GroupedL2Seeds.nearest(
            new GenericArrayData(vec), g, gs)
          val dists = (start(g) until start(g + 1)).map { i =>
            (0 until dim).map { j =>
              val t = vec(j) - flat(i * dim + j); t * t
            }.sum
          }
          // first index with the min distance = smallest svid (ascending)
          val want = svids(start(g) + dists.indexOf(dists.min))
          got == want
        }
      }
    }

  property("WordShingleHashSeq == positional hash60∘array_join∘slice chain") =
    forAll(Gen.listOfN(4, Gen.oneOf("a bc", "x  y\tz", "", " lead",
      "trail ", "one two three four five", "ü Ü ss", "a a a a"))) { texts =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val n = 3
      val kernel = df.select(col("id"),
          columnOf(graft.plans.WordShingleHashSeq(
            expressionOf(col("text")), n, 15)).as("hs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val composed = df.select(col("id"),
          when(size(tokens(col("text"))) >= n,
            transform(sequence(lit(1), size(tokens(col("text"))) - (n - 1)),
              i => hash60(array_join(
                slice(tokens(col("text")), i, lit(n)), " "))))
            .otherwise(array().cast("array<bigint>")).as("hs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      kernel == composed
    }

  private val kmvSetsGen = for {
    nCommon <- Gen.choose(0, 120)
    nA <- Gen.choose(1, 150)
    nB <- Gen.choose(1, 150)
    tag <- Gen.choose(0, 9999)
  } yield (nCommon, nA, nB, tag)

  property("KMV closure: pair-overlap state == brute bottom-k of the union") =
    forAll(kmvSetsGen) { case (nCommon, nA, nB, tag) =>
      val k = 64
      val a = (0 until nCommon).map(i => s"c$tag-$i") ++
        (0 until nA).map(i => s"a$tag-$i")
      val b = (0 until nCommon).map(i => s"c$tag-$i") ++
        (0 until nB).map(i => s"b$tag-$i")
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
      val sk = graft.operators.Sketches.kmvSketch(df, Seq("g"), "v", k)
      val row = graft.operators.Sketches.kmvPairOverlap(sk, "g", k)
        .collect().head
      def hashesOf(vals: Seq[String]): Set[Long] =
        vals.distinct.toDF("v").select(hash28(col("v")).as("h"))
          .collect().map(_.getLong(0)).toSet
      val ha = hashesOf(a)
      val hb = hashesOf(b)
      val bottom = (ha ++ hb).toSeq.sorted.take(k)
      // the k smallest of sketch(A) ∪ sketch(B) ARE the k smallest of the
      // union (closure), membership flags are exact, and exact-mode fires
      // exactly when the union is smaller than k
      row.getAs[Long]("n_kept") == bottom.size &&
        row.getAs[Long]("kth_hash") == bottom.last &&
        row.getAs[Long]("n_common") ==
          bottom.count(h => ha.contains(h) && hb.contains(h)) &&
        ((ha ++ hb).size >= k ||
          row.getAs[Double]("est_union") == bottom.size.toDouble)
    }

  private val snapshotGen = for {
    nOld <- Gen.choose(0, 20)
    nNew <- Gen.choose(0, 20)
    olds <- Gen.listOfN(nOld, for {
      kk <- Gen.choose(1L, 15L); fp <- Gen.oneOf("p", "q", "r")
    } yield (kk, fp))
    news <- Gen.listOfN(nNew, for {
      kk <- Gen.choose(1L, 15L); fp <- Gen.oneOf("p", "q", "r")
    } yield (kk, fp))
  } yield (olds.distinctBy(_._1), news.distinctBy(_._1))

  property("snapshotDiff == plain-Scala classification model") =
    forAll(snapshotGen) { case (olds, news) =>
      val o = olds.map { case (kk, fp) => (kk, "g", fp) }.toDF("k", "src", "fp")
      val n = news.map { case (kk, fp) => (kk, "g", fp) }.toDF("k", "src", "fp")
      val got = graft.operators.SnapshotDiff.diff(o, n, "k", "src", "fp")
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("status"))
        .toMap
      val om = olds.toMap
      val nm = news.toMap
      val want = (om.keySet ++ nm.keySet).map { kk =>
        kk -> ((om.get(kk), nm.get(kk)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(x), Some(y)) if x != y => "changed"
          case _ => "unchanged"
        })
      }.toMap
      got == want
    }

  private val windowEventsGen = for {
    n <- Gen.choose(1, 12)
    m <- Gen.choose(0, 12)
    w <- Gen.choose(3L, 40L)
    ls <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 120L)
    } yield (k, t))
    rs <- Gen.listOfN(m, for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 120L)
      v <- Gen.choose(1, 99)
    } yield (k, t, v / 10.0))
  } yield (ls, rs, w)

  property("recentWindowAgg == naive [ts-W, ts) range-join model") =
    forAll(windowEventsGen) { case (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "us")
        .select($"id", $"k", timestamp_micros($"us").as("ts"))
      val right = rs.toDF("k", "rus", "v")
        .select($"k", timestamp_micros($"rus").as("rts"), $"v")
      val got = graft.operators.Temporal
        .recentWindowAgg(left, right, "k", "id", "ts", "rts", w, "v")
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_in_window"),
            r.getAs[Double]("win_value")))).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val inWin = rs.filter { case (rk, rt, _) =>
          rk == k && rt >= t - w && rt < t }
        // BigDecimal sum == the operator's decimal(30,6) exact path
        i.toLong -> ((inWin.size.toLong,
          inWin.map(e => BigDecimal(e._3).setScale(6,
            BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
      }.toMap
      got == want
    }

  // small integer grid on purpose: duplicated values and exact cosine
  // TIES between centroids are common, exercising the tie-break paths
  // the engineered blob fixtures cannot reach
  private val ivfCorpusGen = for {
    n <- Gen.choose(6, 28)
    vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(0, 3).map(_.toFloat)))
      .suchThat(_.exists(_.exists(_ != 0f))) // at least one nonzero vector
    nDelta <- Gen.choose(1, n - 1)
  } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .filter(_._2.exists(_ != 0f)), nDelta) // all-zero vectors have no cosine

  property("IvfFlat ADD == union assignment; pruned serve == fresh knnIvfWith, on tie-prone corpora") =
    forAll(ivfCorpusGen) { case (rows, nDelta) =>
      import graft.operators.{Clustering, Similarity}
      val df = rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val corpus = df.filter($"vec_id" >= nDelta)
      val delta = df.filter($"vec_id" < nDelta)
      if (corpus.isEmpty) true
      else {
        val idx = Clustering.buildIvfFlatIndex(corpus, "vec_id", "embedding",
          numCentroids = 3, iters = 2)
        val cents = Similarity.centroidSetFromLanes(idx.lanes)
        // the two-pass add must equal the one-pass union assignment
        val updated = Clustering.updateIvfFlatIndex(idx, delta,
          "vec_id", "embedding")
        def cellsOf(p: org.apache.spark.sql.DataFrame) =
          p.select($"n_id", $"c_id".cast("long")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val addOk = cellsOf(updated.postings) ==
          cellsOf(Similarity.ivfPostings(df, "vec_id", "embedding", cents))
        // and the statically-pruned serve never loses a cell: it must
        // equal the unpruned fresh search against the same codebook
        val served = Clustering.serveIvfFlat(updated, df, "vec_id",
          "embedding", maxQueryId = 3L, nprobe = 2, k = 3)
          .collect().map(_.toSeq).toSet
        val fresh = Similarity.knnIvfWith(df, "vec_id", "embedding",
          cents, maxQueryId = 3L, nprobe = 2, k = 3)
          .collect().map(_.toSeq).toSet
        addOk && served == fresh
      }
    }

  // IMI needs a nonzero norm in EACH half (the cosine metric's zero-
  // vector caveat, per half-space) — filter rather than skew the gen
  private val imiCorpusGen = for {
    n <- Gen.choose(6, 24)
    vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(0, 3).map(_.toFloat)))
      .map(_.filter(v => v.take(2).exists(_ != 0f) && v.drop(2).exists(_ != 0f)))
      .suchThat(_.size >= 4)
    nDelta <- Gen.choose(1, 3)
  } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, nDelta)

  property("IMI ADD == per-half union assignment; pruned serve == unpruned rerank, on tie-prone corpora") =
    forAll(imiCorpusGen) { case (rows, nDelta) =>
      import graft.operators.{Clustering, Similarity}
      val df = rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val corpus = df.filter($"vec_id" >= nDelta)
      val delta = df.filter($"vec_id" < nDelta)
      if (corpus.isEmpty || delta.isEmpty) true
      else {
        val (kA, kB) = (2, 2)
        val idx = Clustering.buildImiIndex(corpus, "vec_id", "embedding",
          dim = 4, kA, kB, iters = 2)
        val updated = Clustering.updateImiIndex(idx, delta,
          "vec_id", "embedding")
        // reference: per-half kernel assignment of the UNION under the
        // same fixed half-codebooks, composed cA·kB + cB
        def halfCells(lanes: org.apache.spark.sql.DataFrame, start: Int) =
          Similarity.ivfPostings(
              df.select($"vec_id",
                expr(s"slice(embedding, ${start + 1}, 2)").as("hv")),
              "vec_id", "hv", Similarity.centroidSetFromLanes(lanes))
            .select($"n_id", $"c_id")
        val want = halfCells(idx.lanesA, 0).withColumnRenamed("c_id", "ca")
          .join(halfCells(idx.lanesB, 2).withColumnRenamed("c_id", "cb"),
            "n_id")
          .select($"n_id", ($"ca" * kB + $"cb").cast("long").as("c_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = updated.postings.select($"n_id", $"c_id".cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // and the statically-pruned serve never loses a probed cell: it
        // must equal the UNPRUNED rerank over the same probes
        val served = Clustering.serveImi(updated, df, "vec_id",
          "embedding", maxQueryId = 3L, nprobe = 2, k = 3)
          .collect().map(_.toSeq).toSet
        val unpruned = Similarity.ivfRerank(updated.postings,
            Similarity.ivfProbeQueries(df, "vec_id", "embedding",
              Clustering.imiComposedCentroids(updated), 3L, 2), 3)
          .collect().map(_.toSeq).toSet
        got == want && served == unpruned
      }
    }

  property("residual two-stage at FULL pool == ivfflat exact serve on random corpora") =
    forAll(for {
      n <- Gen.choose(6, 16)
      rows <- Gen.listOfN(n,
        Gen.listOfN(4, Gen.choose(1, 1000).map(_ / 500.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }) { rows =>
      import graft.operators.Clustering
      // strictly positive lanes: no zero vectors (cosine undefined), no
      // reliance on any particular cluster structure — the identity
      // must hold on ANY corpus because a pool covering every
      // probed-cell candidate makes the rerank the exact cosine over
      // exactly ivfflat's candidate set, regardless of how badly the
      // residual codes rank the shortlist
      val df = rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val flat = Clustering.buildIvfFlatIndex(df, "vec_id", "embedding",
        numCentroids = 3, iters = 2)
      val pqr = Clustering.buildIvfPqrIndexWith(df, "vec_id", "embedding",
        dim = 4, m = 2, k = 2, iters = 2, coarseLanes = flat.lanes)
      def rows3(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val two = rows3(Clustering.serveIvfPqrRerank(pqr, flat.postings, df,
        "vec_id", "embedding", dim = 4, m = 2, maxQueryId = 3L,
        nprobe = 2, rerankPool = rows.length, topK = 3))
      val exact = rows3(Clustering.serveIvfFlat(flat, df, "vec_id",
        "embedding", maxQueryId = 3L, nprobe = 2, k = 3))
      two == exact && two.nonEmpty
    }

  property("SQ8 encode == plain-Scala clamped floor model; trained-on-self codes span the level range") =
    forAll(for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n,
        Gen.listOfN(4, Gen.choose(-1000000, 1000000).map(_ / 997.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }) { rows =>
      import graft.operators.Clustering
      val df = rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val lanes = Clustering.sqFitLanes(df, "embedding", 4)
      val got = Clustering.sqEncode(df, lanes, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
      // reference model: the exact arithmetic the scaladoc claims —
      // trunc-scale to int64, per-dim min/max bounds, clamped
      // floor((x−lo)·255/span) with span = max(hi−lo, 1)
      val scaled = rows.map { case (id, v) =>
        (id, v.map(x => (x.toDouble * 1048576L).toLong)) }
      val lo = (0 until 4).map(d => scaled.map(_._2(d)).min)
      val hi = (0 until 4).map(d => scaled.map(_._2(d)).max)
      val span = (0 until 4).map(d => math.max(hi(d) - lo(d), 1L))
      val model = scaled.map { case (id, v) =>
        (id, (0 until 4).map(d => math.min(255L, math.max(0L,
          math.floor(((v(d) - lo(d)) * 255L).toDouble / span(d).toDouble)
            .toLong))).toList)
      }.toMap
      // bounds trained on the corpus itself: every dim's codes reach 0
      // at its min row and 255 at its max row (0 on a degenerate dim —
      // hi == lo quantizes the whole corpus to one level)
      val ends = (0 until 4).forall { d =>
        val codes = model.values.map(_(d))
        codes.min == 0L && (codes.max == 255L || hi(d) == lo(d))
      }
      got == model && ends
    }
}
