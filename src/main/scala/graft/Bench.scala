package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line the driver parses.
  *
  * Each query is executed through the `noop` sink (not `.count()`): count()
  * lets Catalyst prune projections and eliminate sorts under the aggregate,
  * which would skip exactly the work being measured. The noop sink fully
  * materializes every output row/column on the executors with zero IO cost.
  * Failures are reported (negative duration + stderr), never swallowed.
  *
  * Noise control: the full query list runs TWICE and each query reports its
  * minimum — the write-roundtrip queries (temp-table staging) swing 2-4x
  * with host disk throttling, and min-of-2 measures the code, not the virtio
  * layer. Log level is ERROR: log4j WARNs that carry stack traces (e.g. the
  * benign FileStreamSink metadata probe on glob reads) would otherwise leak
  * frames into stderr and mask real failures; Bench's own failure reports
  * print directly to stderr and are unaffected.
  */
object Bench {
  /** The driver-contract corpus. Only full-board runs at THIS sf dir
    * stamp the round archive — a scaled-corpus run would otherwise
    * poison the next round's 1.5x regression reference with
    * wrong-scale timings. */
  val DefaultSfDir = "/root/testdata/sf0.1"

  /** Repo root for round detection, the prev-round re-time reference, and
    * the archive writes: a run launched from any other directory must not
    * silently compute round = 1 and write bench_out_r1.json THERE (losing
    * the 1.5× prev-round gate along the way). Resolved from
    * SPARK_GRAFT_REPO when set, else the nearest ancestor of the CWD
    * holding build.sbt, else the CWD itself (the historical behavior). */
  val RepoRoot: java.io.File =
    sys.env.get("SPARK_GRAFT_REPO").map(new java.io.File(_))
      .orElse(Iterator.iterate(
          new java.io.File(".").getAbsoluteFile.getParentFile)(_.getParentFile)
        .takeWhile(_ != null) // walk to the filesystem root, no depth cap
        .find(d => new java.io.File(d, "build.sbt").exists()))
      .getOrElse {
        // the CWD fallback reintroduces the wrong-directory round=1 /
        // misplaced-archive failure mode this constant exists to prevent
        // — make the misdetection VISIBLE in the run output
        System.err.println("[bench] WARNING: no build.sbt found on any " +
          "ancestor of the CWD and SPARK_GRAFT_REPO is unset — round " +
          "detection and archive writes fall back to the CWD " +
          s"(${new java.io.File(".").getAbsolutePath})")
        new java.io.File(".")
      }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Pre-run contention gate: loadavg sampled BEFORE the SparkSession
    // exists — the session build + 32-way warmup jobs push the 1-min
    // loadavg by 1-3 on their own, so a post-warmup sample would flag a
    // CLEAN box as contended (the exact misclassification the gate is
    // for). A run started on a busy box is FLAGGED in the artifact
    // metadata so round-over-round comparisons know to distrust this
    // round's drift (r10 saw ~15 unchanged queries drift +30-80% under
    // load_max 6.87).
    val loadStart: Double =
      (try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+").headOption
      catch { case _: Throwable => None })
        .flatMap(f => scala.util.Try(f.toDouble).toOption).getOrElse(-1.0)
    // Optional scan-split override (SPARK_GRAFT_MAX_PARTITION_BYTES, e.g.
    // "2m"): the scaled one-file corpora (/tmp/x25 …) compress to well
    // under the 128 MB default split, so per-row kernel scans (tokenizer
    // encodes) run in 1-4 tasks and 32 cores idle — the documented
    // q130/q149 per-task-work plateau. On a real cluster input splits
    // scale with data; locally this knob is how the operator fills the
    // cores. Results are unchanged by construction (split count never
    // affects per-row kernels or aggregates) — BASELINE.md records the
    // measured effect. Left unset for the driver's committed sf0.1 board.
    val builder = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
    val spark = sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .fold(builder)(v => builder.config("spark.sql.files.maxPartitionBytes", v))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM (codegen compiler, parquet reader, shuffle paths) so the
    // alphabetically-first query doesn't absorb ~5s of one-time startup.
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // Also warm the decimal hash-agg codegen path and the big-table scan:
    // q01 (alphabetically first) otherwise pays both one-time costs in BOTH
    // passes (pass 2 runs after 50+ queries have evicted its compiled
    // code), reporting JIT startup instead of steady-state query speed.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast(DecimalType(30, 2))))
        .write.format("noop").mode("overwrite").save()
    }
    def loadavgFields: Array[String] =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+")
      catch { case _: Throwable => Array.empty }
    def loadavg1: Double =
      loadavgFields.headOption
        .flatMap(f => scala.util.Try(f.toDouble).toOption).getOrElse(-1.0)
    // This round's number: one past the newest driver-committed
    // BENCH_r*.json. Used to stamp the archived per-query map so future
    // rounds diff against committed history, not the truncated ~2KB tail.
    val round = {
      val pat = """BENCH_r(\d+)\.json""".r
      val files = Option(RepoRoot.list()).getOrElse(Array.empty)
      files.collect { case pat(n) => n.toInt }.foldLeft(0)(math.max) + 1
    }
    // Previous round's full per-query map (bench_out_r<N>.json committed
    // each round from this same code path): the second re-time reference
    // beside QuietBaseline — a query >1.5x its previous-round time gets
    // the end-of-run third pass even when its all-time quiet min is far
    // lower (catches fresh regressions the 2x-of-min gate would miss).
    // Scaled-corpus runs skip the gate entirely: the archives hold
    // default-sf timings, and comparing a 25× run against them would
    // flag every heavy query for a spurious third pass.
    val prevQueries: Map[String, Double] = if (sfDir != DefaultSfDir) Map.empty else {
      val pat = """bench_out_r(\d+)\.json""".r
      val files = Option(RepoRoot.list()).getOrElse(Array.empty)
      val prev = files.collect { case f @ pat(n) if n.toInt < round => (n.toInt, f) }
      prev.sortBy(-_._1).headOption.map { case (_, f) =>
        val text = try java.nio.file.Files.readString(
            new java.io.File(RepoRoot, f).toPath)
          catch { case _: Throwable => "" }
        """"queries":\{(.*?)\}""".r.findFirstMatchIn(text).map(_.group(1))
          .map { body =>
            """"(q\d+[a-z_0-9]*)":(-?[0-9.]+)""".r.findAllMatchIn(body)
              .map(x => x.group(1) -> x.group(2).toDouble)
              .filter(_._2 > 0).toMap
          }.getOrElse(Map.empty[String, Double])
      }.getOrElse(Map.empty)
    }
    // One timed standalone execution: (+ seconds on success, - on failure,
    // 1-min loadavg at measurement time).
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val la = loadavg1
      // Drop cached frames a query persisted (LSH signatures): each query
      // must be timed standalone, not against another query's leftovers.
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      (if (ok) dt else -dt, la)
    }
    // Dev knob: SPARK_GRAFT_ONLY=q64_repetition,q68_pack_shards times a
    // subset (absent = the full driver contract).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val bad = names.diff(SparkEntry.queries.keySet)
      require(bad.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${bad.mkString(", ")} " +
          "(a typo would otherwise benchmark nothing and print total=0)")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    val passes = Seq.fill(2)(queries.map { case (name, fn) => timeOne(name, fn) })
    def minOf(runs: Seq[(Double, Double)]): (Double, Double) = {
      val good = runs.filter(_._1 >= 0)
      // min over successful runs; negative (failure) only if every run failed
      if (good.nonEmpty) good.minBy(_._1)
      else { val w = runs.minBy(r => -r._1); (w._1, w._2) }
    }
    val firstCut = queries.map(_._1).zipWithIndex.map { case (name, i) =>
      name -> minOf(passes.map(_(i)))
    }
    // Adaptive outlier re-timing: two back-to-back passes can BOTH sit
    // inside one host-disk-throttle window, so any query whose min still
    // exceeds 2× its known quiet-run value gets a third, END-OF-RUN
    // re-pass (minutes later, typically outside the throttle window) and
    // keeps the min of all three. Quiet values are the round-7/8 local
    // clean-run numbers; queries not listed (new this round) use the
    // pass-1 value as their own reference and are never re-timed.
    // Both re-time references (QuietBaseline AND the prev-round archive)
    // hold DEFAULT-sf timings, so a scaled-corpus run would flag every
    // heavy query for a spurious third pass — skip the gate entirely off
    // the contract corpus (min-of-2 still applies; scaled runs quote
    // their own ratios, not the quiet envelope).
    val retimed = if (sfDir != DefaultSfDir) Seq.empty[String] else firstCut.collect {
      case (name, (t, _)) if t > 0 &&
          (QuietBaseline.secs.get(name).exists(q => t > 2 * q) ||
            prevQueries.get(name).exists(p => t > 1.5 * p)) => name
    }
    val retimes = retimed.map { name =>
      name -> timeOne(name, SparkEntry.queries(name))
    }.toMap
    val results = firstCut.map { case (name, best) =>
      name -> retimes.get(name).filter(r => r._1 >= 0 && r._1 < best._1)
        .getOrElse(best)
    }
    // Seconds at 3 decimals: full nanoTime precision is noise beyond ~1ms
    // and doubles the line length (the driver keeps only the last ~2KB).
    // Locale.ROOT: the default f-interpolator formats through the JVM
    // locale, and a comma decimal separator (de_DE etc.) would make the
    // line invalid JSON and silently corrupt the quiet-baseline harvest.
    def fmt(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Loadavg is summarized (max + mean over per-query 1-min samples), not
    // emitted per query: 93 per-query load entries once pushed the timings
    // map out of the driver's ~2KB tail capture window, so readers saw load
    // averages where they expected seconds (BENCH_r08). High max/mean here
    // still signals box contention; per-query samples carried no extra info
    // (they move on a 1-minute clock, so neighbors are identical anyway).
    val las = results.map(_._2._2).filter(_ >= 0)
    val loadMax = if (las.isEmpty) -1.0 else math.rint(las.max * 100) / 100
    val loadMean =
      if (las.isEmpty) -1.0 else math.rint(las.sum / las.size * 100) / 100
    val total = results.map(_._2._1.abs).sum
    val loadavg = loadavgFields.take(3).mkString(",")
    val retimedJson = retimed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver records only the final ~2KB of stdout, and at 107 queries
    // the full timings map alone is ~3KB — whatever precedes it is lost.
    // So the LAST fields of the line are a compact self-sufficient summary
    // (~400 bytes): the total, the ten slowest queries, and a pointer to
    // bench_out.json which holds the complete line. Any tail window that
    // catches the end of the line catches total + slowest-10.
    val slowest = results
      .filter(_._2._1 > 0)
      .sortBy { case (_, (t, _)) => -t }
      .take(10)
      .map { case (k, (v, _)) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val loadGate = if (loadStart > 2.0) "contended" else "clean"
    // Corpus scale, so the driver's scaling probe can tell "fixed-cost
    // floor" from "ignores cpus": at the contract sf0.1 every query sits
    // on ~0.1-0.9 s job/write floors and 8-core ≈ 32-core wall time is
    // EXPECTED (BENCH_r18's suspect_cpus_ignored false positive). Bytes
    // and the documents row-count proxy are driver-side file stats — no
    // Spark job, and purely ADDITIVE to the line format.
    val corpusBytes: Long =
      try {
        val d = new java.io.File(sfDir)
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.isFile).map(_.length()).sum
      } catch { case _: Throwable => -1L }
    // Round archive only for full-board runs at the contract corpus —
    // subset runs would plant a partial map, scaled-corpus runs
    // wrong-scale timings (load_gate rides inside the line, so a
    // contended archive is at least self-describing).
    val archive =
      if (only.isEmpty && sfDir == DefaultSfDir) s"bench_out_r$round.json"
      else "bench_out.json"
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","passes":2,"round":$round,"corpus_bytes":$corpusBytes,"load_start":${fmt(loadStart)},"load_gate":"$loadGate","retimed":$retimedJson,"loadavg":"$loadavg","load_max":$loadMax,"load_mean":$loadMean,"queries":$qs,"total":${fmt(total)},"slowest":$slowest,"queries_file":"$archive"}"""
    println(line)
    // Belt-and-braces: the same line as file artifacts, immune to stdout
    // interleaving/truncation entirely. The round-stamped copy is the
    // committed per-round archive future rounds diff against (and the
    // prevQueries re-time reference above); bench_out.json stays as the
    // stable latest-run pointer.
    // A SPARK_GRAFT_ONLY subset run must not plant a partial map as the
    // round archive — future rounds would read it as "every other query
    // vanished". Only full-board runs stamp the archive.
    for (f <- (Seq("bench_out.json") :+ archive).distinct) {
      try java.nio.file.Files.writeString(
        new java.io.File(RepoRoot, f).toPath, line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $f: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
