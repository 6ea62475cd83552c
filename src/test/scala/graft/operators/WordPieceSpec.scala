package graft.operators

import graft.SparkSpec
import graft.plans.{WordPieceStats, WpLookup}

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def wf(pairs: (String, Long)*) = pairs.toDF("word", "freq")

  test("likelihood argmax beats raw frequency where the rules differ") {
    // "aab" x4, "cd" x3: pair (a,a) cnt=4 with fa=8, (a,b) cnt=4 fb=4,
    // (c,d) cnt=3 with fc=fd=3.
    //   skey(a,a) = 4<<40 / 64,  skey(a,b) = 4<<40 / 32,
    //   skey(c,d) = 3<<40 / 9  — the RARE-parts pair (c,d) wins even
    // though (a,a)/(a,b) have the higher raw count; plain BPE picks the
    // count argmax instead. That divergence IS WordPiece.
    val freqs = wf("aab" -> 4L, "cd" -> 3L)
    val (wp, _) = WordPiece.trainLocal(freqs, 1)
    assert(wp.head.lhs == "c" && wp.head.rhs == "d", wp.head)
    assert(wp.head.cnt == 3L)
    assert(wp.head.skey == (BigInt(3) << 40) / 9)
    val (bp, _) = Bpe.trainLocal(freqs, 1)
    assert(bp.head.lhs == "a", bp.head) // count argmax: cnt 4, lex ties -> (a,a)
  }

  test("trainLocal == train (merges, skeys, and final tokens)") {
    val freqs = wf("low" -> 3L, "lower" -> 2L, "newest" -> 4L,
      "widest" -> 1L, "cd" -> 5L)
    val (dm, dt) = WordPiece.train(freqs, 4)
    val (lm, lt) = WordPiece.trainLocal(freqs, 4)
    assert(lm == dm, s"local=$lm dist=$dm")
    assert(lt.collect().map(_.toSeq).toSet == dt.collect().map(_.toSeq).toSet)
  }

  test("vocab extraction tags pieces by position class; encode is greedy longest-match") {
    // final tokens engineered directly: "lo" head, "w"/"er" continuations,
    // plus "low" as a fully-merged head piece
    val toks = Seq(("lower", 0, "lo"), ("lower", 1, "w"), ("lower", 2, "er"),
      ("low", 0, "low")).toDF("word", "pos", "tok")
    val v = WordPiece.vocabOf(toks)
    assert(v.head.toSeq == Seq("lo", "low"))
    assert(v.cont.toSeq == Seq("er", "w"))
    val lk = WpLookup(v.head, v.cont)
    // greedy takes the LONGEST head piece: "low" (not "lo"), then "er"
    assert(WordPieceStats.encodeCount("lower", lk, 12) == 2L)
    assert(WordPieceStats.encodeCount("low", lk, 12) == 1L)
    // dead end: "lo" + no cont piece matching "x" -> [UNK]
    assert(WordPieceStats.encodeCount("lox", lk, 12) == -1L)
    // greedy overshoot dead-ends even when a segmentation exists:
    // "lowerer" greedy = low + er + er = 3 (fine), but "lowx" = low + UNK
    assert(WordPieceStats.encodeCount("lowerer", lk, 12) == 3L)
    // over-length word -> [UNK] regardless of coverage
    assert(WordPieceStats.encodeCount("lower", lk, 4) == -1L)
  }

  test("kernel doc stats count words, tokens, and UNKs over real text") {
    val toks = Seq(("ab", 0, "ab"), ("cd", 0, "c"), ("cd", 1, "d"))
      .toDF("word", "pos", "tok")
    val v = WordPiece.vocabOf(toks)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val out = Seq((1L, "Ab cd AB!"), (2L, "zz ab"), (3L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id",
        columnOf(WordPieceStats(expressionOf($"text"),
          WpLookup(v.head, v.cont), 12)).as("st"))
      .selectExpr("doc_id", "st[0] as nw", "st[1] as nt", "st[2] as nu")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    // doc 1: ab + cd + ab = 3 words, 1+2+1 tokens, 0 unk
    // doc 2: zz -> UNK (1 token), ab -> 1
    // doc 3: no words
    assert(out == Seq((1L, 3L, 4L, 0L), (2L, 2L, 2L, 1L), (3L, 0L, 0L, 0L)))
  }

  test("vocabulary roundtrips through parquet") {
    val toks = Seq(("lower", 0, "lo"), ("lower", 1, "w"), ("lower", 2, "er"))
      .toDF("word", "pos", "tok")
    val v = WordPiece.vocabOf(toks)
    val path = tmpDir("wpvocab_roundtrip")
    WordPiece.saveVocab(v, spark, path)
    val l = WordPiece.loadVocab(spark, path)
    assert(l.head.toSeq == v.head.toSeq && l.cont.toSeq == v.cont.toSeq)
  }
}
