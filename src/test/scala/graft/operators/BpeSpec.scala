package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def wf(pairs: (String, Long)*) = pairs.toDF("word", "freq")

  test("induction matches the hand-computed Sennrich example, incl. tie-break") {
    // low x3, lower x2, newest x4, widest x1 — the classic worked example.
    // Round 1: (w,e) wins with 6 (2 in lower + 4 in newest).
    // Round 2: (l,o) and (s,t) tie at 5 -> lexicographic lhs picks (l,o).
    val freqs = wf("low" -> 3L, "lower" -> 2L, "newest" -> 4L, "widest" -> 1L)
    val (merges, toks) = Bpe.train(freqs, 3)
    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.cnt)) == Seq(
      (1, "w", "e", 6L), (2, "l", "o", 5L), (3, "s", "t", 5L)))
    val byWord = toks.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byWord("low") == Seq("lo", "w"))
    assert(byWord("lower") == Seq("lo", "we", "r"))
    assert(byWord("newest") == Seq("n", "e", "we", "st"))
    assert(byWord("widest") == Seq("w", "i", "d", "e", "st"))
  }

  test("trainLocal == train on supplementary-plane tokens and ties") {
    // Two single-occurrence words engineer a tied pair count where the
    // candidates' lhs are U+E000 (private-use BMP) vs U+10000
    // (supplementary, a surrogate pair in UTF-16): Spark/DuckDB compare
    // strings by code point, Java's default String order by UTF-16 unit
    // — which INVERTS this exact pair. The two trainers must still pick
    // the same winner, and the code-point word split must not shatter
    // the surrogate pair.
    val e000 = ""
    val u10000 = new String(Character.toChars(0x10000))
    val freqs = wf(s"${e000}a" -> 1L, s"${u10000}a" -> 1L)
    val (dm, dt) = Bpe.train(freqs, 1)
    val (lm, lt) = Bpe.trainLocal(freqs, 1)
    assert(lm.map(m => (m.step, m.lhs, m.rhs, m.cnt)) ==
      dm.map(m => (m.step, m.lhs, m.rhs, m.cnt)))
    // code-point order: U+E000 < U+10000 wins the tie
    assert(dm.head.lhs == e000 && dm.head.rhs == "a")
    assert(lt.collect().map(_.toSeq).toSet == dt.collect().map(_.toSeq).toSet)
  }

  test("run-parity merge equals sequential leftmost-greedy on identical pairs") {
    // aaaa: candidates at 0,1,2; greedy takes 0 and 2 -> [aa, aa].
    // aaaaa: candidates 0..3; greedy takes 0 and 2 -> [aa, aa, a].
    // Overlapping pairs COUNT (aaaa has 3), matching the reference trainer.
    val (m4, t4) = Bpe.train(wf("aaaa" -> 1L), 1)
    assert(m4.map(m => (m.lhs, m.rhs, m.cnt)) == Seq(("a", "a", 3L)))
    assert(t4.orderBy("pos").collect().map(_.getString(2)).toSeq == Seq("aa", "aa"))
    val (m5, t5) = Bpe.train(wf("aaaaa" -> 1L), 1)
    assert(m5.head.cnt == 4L)
    assert(t5.orderBy("pos").collect().map(_.getString(2)).toSeq ==
      Seq("aa", "aa", "a"))
  }

  test("tokens always reassemble their word; counts shrink by merges applied") {
    val corpus = wf("banana" -> 5L, "bandana" -> 3L, "cabana" -> 2L,
      "an" -> 7L, "x" -> 1L)
    for (rounds <- Seq(1, 3, 6)) {
      val (merges, toks) = Bpe.train(corpus, rounds)
      assert(merges.size <= rounds)
      val byWord = toks.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      // round-trip: concatenated tokens == the word, positions dense
      byWord.foreach { case (w, rows) =>
        assert(rows.map(_._3).mkString == w, s"$w broke round-trip")
        assert(rows.map(_._2).toSeq == (0 until rows.length), s"$w positions")
      }
      assert(byWord.keySet == Set("banana", "bandana", "cabana", "an", "x"))
    }
  }

  test("exhaustion: single-char vocabulary stops early instead of failing") {
    val (merges, toks) = Bpe.train(wf("a" -> 3L, "b" -> 2L), 4)
    assert(merges.isEmpty)
    assert(toks.collect().map(r => (r.getString(0), r.getString(2))).toSet ==
      Set(("a", "a"), ("b", "b")))
  }

  test("encode kernel reproduces the trainer's tokenization exactly") {
    import graft.plans.BpeDocStats
    val freqs = wf("low" -> 3L, "lower" -> 2L, "newest" -> 4L, "widest" -> 1L)
    val (merges, toks) = Bpe.train(freqs, 3)
    val lhs = merges.map(_.lhs).toArray
    val rhs = merges.map(_.rhs).toArray
    val trained = toks.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    trained.foreach { case (w, expect) =>
      assert(BpeDocStats.encode(w, lhs, rhs).toSeq == expect,
        s"kernel diverged from trainer on '$w'")
    }
    // greedy-run edge: the kernel applies leftmost-nonoverlapping too
    assert(BpeDocStats.encode("aaaa", Array("a"), Array("a")).toSeq ==
      Seq("aa", "aa"))
    assert(BpeDocStats.encode("aaaaa", Array("a"), Array("a")).toSeq ==
      Seq("aa", "aa", "a"))
    // end-to-end through the expression (codegen path), incl. word split
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val docs = Seq((1L, "Lower, newest!  LOW low")).toDF("doc_id", "text")
    val got = docs.select(
        columnOf(BpeDocStats(expressionOf($"text"), lhs, rhs)).as("st"))
      .collect().head.getSeq[Long](0)
    // words: lower, newest, low, low -> tokens 3 + 4 + 2 + 2 = 11, max "st"/"lo"/"we" = 2
    assert(got == Seq(4L, 11L, 2L), s"got $got")
  }

  test("docWords lowercases, splits on non-alnum runs, drops empties") {
    val docs = Seq((1L, "Hello, WORLD!  42-ok"), (2L, "--")).toDF("doc_id", "text")
    val got = Bpe.docWords(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "hello"), (1L, "world"), (1L, "42"), (1L, "ok")))
  }
}
