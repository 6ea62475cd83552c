package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.UnigramDocStats

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def wf(pairs: (String, Long)*) = pairs.toDF("word", "freq")

  // ── ilog2fp ─────────────────────────────────────────────────────────────

  test("ilog2fp is exact on powers of two") {
    val f = UnigramLm.LogFracBits
    for (k <- 0 to 62)
      assert(UnigramLm.ilog2fp(1L << k) == k.toLong << f, s"2^$k")
  }

  test("ilog2fp is monotone and within tolerance of real log2") {
    val rnd = new scala.util.Random(7)
    val ns = (Seq(1L, 2L, 3L, 10L, 1000L, Long.MaxValue) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % (1L << 50) + 1)).sorted
    val f = UnigramLm.LogFracBits
    ns.sliding(2).foreach { case Seq(a, b) =>
      assert(UnigramLm.ilog2fp(a) <= UnigramLm.ilog2fp(b), s"$a vs $b")
    case _ => ()
    }
    ns.foreach { n =>
      val approx = UnigramLm.ilog2fp(n).toDouble / (1L << f)
      val real = math.log(n.toDouble) / math.log(2.0)
      // truncating digit-by-digit: approx <= real, off by at most a few ulps
      assert(approx <= real + 1e-9 && real - approx < 1e-3, s"n=$n")
    }
  }

  // ── Viterbi vs brute force ──────────────────────────────────────────────

  /** All segmentations of `word` into vocab pieces (single chars always
    * allowed at unkCost), compared by the kernel's total order: (cost,
    * n_pieces, then from the LAST piece backwards longer-piece-first). */
  private def bruteBest(word: String, vocab: Map[String, Long],
                        maxLen: Int, unk: Long): (Long, Seq[String]) = {
    def segs(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p) || l == 1) segs(w.substring(l)).map(p :: _)
        else Nil
      }
    def cost(s: List[String]): Long =
      s.map(p => vocab.getOrElse(p, unk)).sum
    val all = segs(word)
    // reversed length sequence, each negated: lexicographic min prefers
    // the longer piece at the end, then recursively toward the front —
    // the DP's per-position (cost, np, L DESC) rule composed globally
    val best = all.minBy[(Long, Int, Seq[Int])](s =>
      (cost(s), s.length, s.reverse.map(p => -p.length)))(
      Ordering.Tuple3(Ordering.Long, Ordering.Int,
        Ordering.Implicits.seqOrdering[Seq, Int]))
    (cost(best), best)
  }

  private def toJava(m: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    m.foreach { case (k, v) => h.put(k, v) }
    h
  }

  test("Viterbi segmentation matches brute-force enumeration incl. tie-breaks") {
    val rnd = new scala.util.Random(11)
    val alphabet = "ab"
    for (_ <- 1 to 300) {
      val word = Seq.fill(rnd.nextInt(9) + 1)(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random small vocab over the alphabet, costs in a range that
      // produces frequent ties
      val pieces = (for {
        l <- 1 to 3
        s <- (0 to 8).map(_ => Seq.fill(l)(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      } yield s).distinct
      val vocab = pieces.map(p => p -> (rnd.nextInt(4) + 1).toLong * 10).toMap
      val unk = 100L
      val got = UnigramDocStats.segment(word, toJava(vocab), 3, unk)
      val (bc, bs) = bruteBest(word, vocab, 3, unk)
      assert(got.toSeq == bs,
        s"word=$word vocab=$vocab got=${got.toSeq} want=$bs (cost $bc)")
    }
  }

  // ── trainer ─────────────────────────────────────────────────────────────

  test("trainLocal: counts are consistent with re-segmenting the corpus") {
    val freqs = wf("low" -> 3L, "lower" -> 2L, "newest" -> 4L, "widest" -> 1L)
    val vocab = UnigramLm.trainLocal(freqs)
    // pieces sorted, unique, costs positive, chars all present
    val ps = vocab.pieces.map(_.piece)
    assert(ps == ps.sorted && ps.distinct == ps)
    assert(vocab.pieces.forall(_.cost >= 0) && vocab.unkCost > 0)
    val chars = "lowernst" + "wide"
    chars.foreach(c => assert(ps.contains(c.toString), s"char $c"))
    // re-running the final E-step with the served costs reproduces the
    // reported counts exactly (the vocab IS a fixed point of its output)
    val vm = toJava(vocab.pieces.map(p => p.piece -> p.cost).toMap)
    val recount = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- Seq("low" -> 3L, "lower" -> 2L, "newest" -> 4L, "widest" -> 1L);
         p <- UnigramDocStats.segment(w, vm, UnigramLm.MaxPieceLen, vocab.unkCost))
      recount.updateWith(p)(c => Some(c.getOrElse(0L) + f))
    vocab.pieces.filter(_.cnt > 0).foreach { p =>
      assert(recount.getOrElse(p.piece, 0L) == p.cnt, p.piece)
    }
  }

  test("kernel stats: interpreted eval == codegen == driver segmentation") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val docs = Seq((1L, "Low lower!  NEWEST, widest"), (2L, "zz low"),
      (3L, "---"), (4L, "a1b2 a1b2 newest")).toDF("doc_id", "text")
    val vocab = UnigramLm.trainLocal(
      Bpe.wordFreq(Bpe.docWords(docs, "doc_id", "text")))
    val expr = graft.plans.UnigramDocStats(expressionOf($"text"),
      vocab.pieceArr, vocab.costArr, vocab.unkCost)
    val out = docs.select($"doc_id", columnOf(expr).as("st"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // driver-side expectation
    val vm = toJava(vocab.pieces.map(p => p.piece -> p.cost).toMap)
    val split = "[^a-z0-9]+".r
    docs.collect().foreach { r =>
      val words = split.split(r.getString(1).toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
      val segs = words.map(w =>
        UnigramDocStats.segment(w, vm, UnigramLm.MaxPieceLen, vocab.unkCost))
      val expect = Seq(words.length.toLong,
        segs.map(_.length.toLong).sum,
        segs.flatten.map(p => Option(vm.get(p)).map(_.longValue)
          .getOrElse(vocab.unkCost)).sum)
      assert(out(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
    }
  }

  // ── size-targeted trainer (EM+prune) ────────────────────────────────────

  test("trainLocal(target): prune keeps highest-loss pieces; size == target; floor refused") {
    val freqs = wf("xy" -> 50L, "zw" -> 5L, "q" -> 1L)
    // chars {q,w,x,y,z}; the E-step uses exactly the multi pieces "xy"
    // (count 50) and "zw" (count 5). Removing "xy" re-segments 51
    // weighted occurrences onto the x/y char path vs 6 for "zw", so the
    // loss order is xy > zw — target 6 must keep exactly {xy}, 7 both.
    val one = UnigramLm.trainLocal(freqs, 6)
    assert(one.pieces.map(_.piece).filter(_.length > 1) == Seq("xy"))
    assert(one.pieces.size == 6)
    val two = UnigramLm.trainLocal(freqs, 7)
    assert(two.pieces.map(_.piece).filter(_.length > 1).toSet == Set("xy", "zw"))
    assert(two.pieces.size == 7)
    // below the single-char coverage floor: refused, not silently clamped
    intercept[IllegalArgumentException] { UnigramLm.trainLocal(freqs, 4) }
  }

  test("trainLocal(target): tighter targets yield smaller vocabularies and more tokens") {
    val pairs = Seq("lowest" -> 9L, "lower" -> 7L, "low" -> 5L,
      "newest" -> 8L, "newer" -> 6L, "new" -> 4L, "widest" -> 3L, "wide" -> 2L)
    val freqs = wf(pairs: _*)
    val nchars = pairs.flatMap(_._1.toCharArray.map(_.toString)).distinct.size
    val wide = UnigramLm.trainLocal(freqs, nchars + 6)
    val narrow = UnigramLm.trainLocal(freqs, nchars + 2)
    assert(wide.pieces.size == nchars + 6)
    assert(narrow.pieces.size == nchars + 2)
    // serving under the narrower vocabulary can only segment each word
    // into AT LEAST as many pieces (it lost options, gained none)
    def toks(v: UnigramLm.Vocab): Long = {
      val vm = toJava(v.pieces.map(p => p.piece -> p.cost).toMap)
      pairs.map { case (w, f) =>
        f * UnigramDocStats.segment(w, vm, UnigramLm.MaxPieceLen, v.unkCost).length
      }.sum
    }
    assert(toks(narrow) > toks(wide))
  }

  test("vocabulary save/load roundtrip serves identically") {
    val freqs = wf("abcab" -> 5L, "cab" -> 2L, "bc" -> 7L)
    val trained = UnigramLm.trainLocal(freqs)
    val dir = tmpDir("ugvocab")
    UnigramLm.saveVocab(trained, spark, dir)
    val loaded = UnigramLm.loadVocab(spark, dir)
    assert(loaded.pieces == trained.pieces)
    assert(loaded.unkCost == trained.unkCost)
  }

  test("unseen single characters segment via unkCost") {
    val trained = UnigramLm.trainLocal(wf("aa" -> 2L))
    val vm = toJava(trained.pieces.map(p => p.piece -> p.cost).toMap)
    val seg = UnigramDocStats.segment("axa", vm, UnigramLm.MaxPieceLen,
      trained.unkCost)
    assert(seg.toSeq == Seq("a", "x", "a"))
  }

  test("cross-corpus encode charges exactly unkCost per unseen char (q140's engine face)") {
    // train on corpus A ({aa, b}); encode a corpus-B word with the unseen
    // char 'x' — the total must be the known chars' costs plus ONE
    // unkCost, the arithmetic q140's oracle coalesce replays in SQL
    val trained = UnigramLm.trainLocal(wf("aa" -> 2L, "b" -> 1L))
    val vm = toJava(trained.pieces.map(p => p.piece -> p.cost).toMap)
    val costOf = trained.pieces.map(p => p.piece -> p.cost).toMap
    val (_, cost) = UnigramDocStats.viterbi("axb", vm,
      UnigramLm.MaxPieceLen, trained.unkCost)
    assert(cost(3) == costOf("a") + trained.unkCost + costOf("b"))
    // and unkCost is the smoothed count-zero surprisal: lgTotal - lg(1)
    // = lgTotal, strictly above every trained piece's cost
    assert(trained.pieces.forall(_.cost < trained.unkCost))
  }
}
