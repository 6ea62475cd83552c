package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every native kernel must be reachable from the SQL surface and produce
  * the value the Scala API produces (the shared test session is built
  * with GraftExtensions). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}

  test("all kernels callable from SQL, value-identical to the Scala API") {
    val df = Seq("the cat sat on the mat the cat", "a b a b a")
      .toDF("s")
    df.createOrReplaceTempView("t")

    val sql = spark.sql(
      """SELECT
        |  md5_prefix_long(s, 7) AS h28,
        |  md5_array_long(array(s, s), 7) AS harr,
        |  word_shingle_hashes(s, 3, 7) AS sh,
        |  char_gram_hashes(s, 4, 7) AS cg,
        |  minhash_signature(word_shingle_hashes(s, 3, 7), 16) AS mh,
        |  simhash_of_hashes(word_shingle_hashes(s, 1, 8), 32) AS sim,
        |  sorted_intersect_size(word_shingle_hashes(s, 3, 7),
        |                        word_shingle_hashes(s, 3, 7)) AS isz,
        |  token_stats(s).top_word_n AS topn
        |FROM t""".stripMargin).collect()

    val api = df.select(
      columnOf(Md5PrefixLong(expressionOf($"s"), 7)).as("h28"),
      columnOf(WordShingleHashes(expressionOf($"s"), 3, 7)).as("sh"),
      columnOf(CharGramHashes(expressionOf($"s"), 4, 7)).as("cg"),
      columnOf(MinhashSignature(
        expressionOf(columnOf(WordShingleHashes(expressionOf($"s"), 3, 7))), 16)).as("mh"),
      columnOf(SimhashOfHashes(
        expressionOf(columnOf(WordShingleHashes(expressionOf($"s"), 1, 8))), 32)).as("sim"),
      columnOf(TokenStats(expressionOf($"s"))).getField("top_word_n").as("topn"))
      .collect()

    sql.zip(api).foreach { case (q, a) =>
      assert(q.getLong(0) == a.getLong(0))                     // h28
      assert(q.getSeq[Long](1) == Seq(a.getLong(0)))           // harr: dedup of [s,s]
      assert(q.getSeq[Long](2) == a.getSeq[Long](1))           // sh
      assert(q.getSeq[Long](3) == a.getSeq[Long](2))           // cg
      assert(q.getSeq[Long](4) == a.getSeq[Long](3))           // mh
      assert(q.getLong(5) == a.getLong(4))                     // sim
      assert(q.getInt(6) == q.getSeq[Long](2).length)          // self-intersect
      assert(q.getLong(7) == a.getLong(5))                     // topn
    }
    // md5_array_long's 3rd literal arg switches to duplicates-kept hashing
    // (the frequency-weighted simhash path) — parity with the Scala API
    val dup = spark.sql(
      "SELECT md5_array_long(array(s, s), 7, false) AS h FROM t").collect()
    val dupApi = df.select(columnOf(Md5ArrayLong(
        expressionOf(array($"s", $"s")), 7, distinctSorted = false)).as("h"))
      .collect()
    dup.zip(dupApi).foreach { case (q, a) =>
      assert(q.getSeq[Long](0).length == 2 &&
        q.getSeq[Long](0) == a.getSeq[Long](0))
    }
    // static params must be literals, not columns
    val e = intercept[Exception] {
      spark.sql("SELECT md5_prefix_long(s, CAST(length(s) AS INT)) FROM t").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("every registered kernel stays inside whole-stage codegen (no interpreted fallback)") {
    // Guards the static-forwarder regression class: scalac suppresses the
    // forwarder for an object method shadowing an inherited case-class
    // member, doGenCode then emits a call Janino can't compile, and the
    // stage SILENTLY falls back to interpretation. Two teeth here:
    // (1) CODEGEN_ONLY + fallback=false makes any Janino compile failure
    // THROW instead of degrading; (2) the kernel's Project line must be
    // star-marked (inside a WholeStageCodegen span) in the executed plan.
    val kernels = Seq(
      "md5_prefix_long(s, 7)",
      "md5_array_long(array(s, reverse(s)), 7)",
      "md5_array_long(array(s, s), 7, false)",
      "word_shingle_hashes(s, 3, 7)",
      "char_gram_hashes(s, 4, 7)",
      "minhash_signature(word_shingle_hashes(s, 3, 7), 16)",
      "simhash_of_hashes(word_shingle_hashes(s, 1, 8), 32)",
      "sorted_intersect_size(word_shingle_hashes(s, 3, 7), char_gram_hashes(s, 4, 7))",
      "token_stats(s).top_word_n",
      // most_recent over a plain array-of-struct column
      "most_recent(array(struct(id AS ts, s AS value), struct(id + 5 AS ts, s AS value))).ts")
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback", "true")
    val oldFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try kernels.foreach { k =>
      // spark.range keeps a real physical stage (a local Seq collapses to
      // LocalTableScan with no codegen span)
      val df = spark.range(64)
        .selectExpr("id", "concat('w', cast(id % 7 as string), ' a b a c') AS s")
        .selectExpr(s"$k AS out")
      val fnName = k.takeWhile(_ != '(')
      val plan = df.queryExecution.executedPlan.toString
      val projLine = plan.linesIterator.find(_.contains(fnName)).get.trim
      // "*(n)" is the WholeStageCodegen span marker in the simple plan string
      assert(projLine.startsWith("*("),
        s"$fnName Project not inside WholeStageCodegen:\n$plan")
      // collect (not count: pruning would drop the Project and skip the
      // kernel) forces actual Janino compilation of the span
      assert(df.collect().length == 64)
    } finally {
      conf.set("spark.sql.codegen.fallback", oldFallback)
      conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }
}
