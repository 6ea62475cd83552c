package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned-generation layout for persisted index artifacts — the
  * pointer-file commit protocol every table format with concurrent
  * readers converges on (Iceberg's metadata pointer, Delta's log): an
  * artifact root holds immutable generation directories
  * (`_gen_<ordinal>_<uuid>/`, underscore-prefixed — see [[ordinalOf]])
  * plus one atomic pointer file
  * (`_gen_current`) naming the live generation. This replaces the
  * rename-swap commit (`BulkSink.commit`) for the index tiers, whose
  * contract it could not uphold:
  *
  *  - **Readers never observe a missing artifact.** The swap's two
  *    renames (dest → dest.__replaced, staging → dest) left a gap in
  *    which a concurrent `index-serve` load saw NO directory, and an
  *    in-flight serve planned against the old files lost them when
  *    `.__replaced` was deleted. Here the pointer flip is one atomic
  *    rename, generation files never move, and the DISPLACED generation
  *    is retained until the commit after next — an in-flight serve keeps
  *    a complete on-disk generation for a full update cycle. (A serve
  *    spanning TWO commits of the same artifact can still lose its
  *    files; retention is one generation deep by design — unbounded
  *    retention needs a reader-lease protocol this deployment does not
  *    require.)
  *  - **Racing writers fail loudly instead of silently dropping a
  *    delta.** `index-update`/`index-remove` is a read-modify-write of
  *    the whole artifact; under the rename swap two racing updates both
  *    folded the same base and the second swap silently dropped the
  *    first delta (last-swap-wins — FIXTURES.md §10's documented hole,
  *    the same failure class as the arrival-ordinal race). [[commitGen]]
  *    is a compare-and-swap: the writer records the generation it loaded
  *    and the commit refuses if the pointer moved, under a
  *    create-exclusive `_gen_claim` held only for the pointer flip
  *    (the `EntityTable.tryClaimArrival` test-and-set pattern —
  *    `Files.createFile` for true O_EXCL on local FS, where Hadoop's
  *    overwrite=false emulation is a non-atomic exists() probe).
  *  - **A crashed writer is harmless and detectable.** A crash before
  *    [[commitGen]] leaves an orphaned generation directory; the pointer
  *    still names the old generation, so serves are untouched. Orphans
  *    are swept by the next successful commit and surfaced by
  *    `index-describe` ([[generationReport]]).
  *
  * Legacy compatibility: an artifact with no pointer file (anything
  * written by the tier save functions directly — the query fixtures'
  * layout) resolves to the root path itself, so every load path accepts
  * both layouts; only the CLI verbs write the versioned layout.
  */
object ArtifactStore {

  val PointerFile = "_gen_current"
  val ClaimFile = "_gen_claim"

  /** Per-write options for a FLAT-LAYOUT artifact surface written IN
    * PLACE — a final path with mode=overwrite, no staging directory or
    * generation pointer (saveSemIndex, saveImiIndex, the bounded
    * codebook/meta roots of the sharded tiers, the single-table LSH/CDC
    * saves, …). The engine-wide session default is committer v2
    * (EngineConf — correct for every STAGED write, whose publication is
    * an atomic rename/pointer flip), but v2 commits task files straight
    * into the destination, so a crash mid-job leaves partially-committed
    * part-files a later `spark.read.parquet` silently accepts as the
    * full artifact where v1 failed loudly (no visible data files until
    * job commit). Pinning v1 for exactly these writes restores that
    * failure mode at the cost of one serial rename per file —
    * negligible for the bounded in-place surfaces. (Verified
    * empirically: per-write options reach the Hadoop committer — an
    * invalid version value fails the write.) */
  val InPlaceCommit: Map[String, String] =
    Map("mapreduce.fileoutputcommitter.algorithm.version" -> "1")
  /** Generation directories are UNDERSCORE-prefixed so Spark's file
    * listing never surfaces them to a reader resolving a LEGACY flat
    * root: a crash (or the window between a staged generation landing
    * and the pointer flip) on a pointerless artifact/table would
    * otherwise expose `gen_*` parquet beside the legacy files —
    * "conflicting directory structures" or silent double-reads on
    * every `spark.read.parquet(root)`. Underscore paths are skipped
    * when LISTED but load fine when NAMED explicitly (the `_changes`
    * feed precedent), which is exactly how resolved readers open the
    * live generation. [[ordinalOf]] still accepts the round-16 `gen_`
    * spelling so artifacts written before the rename keep loading. */
  private val GenPrefix = "_gen_"
  private val LegacyGenPrefix = "gen_"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Ordinal of a generation directory name (`_gen_<n>_<uuid>`, or the
    * pre-rename `gen_<n>_<uuid>`). Returns None for anything else —
    * including the pointer and claim FILES, which share the `_gen_`
    * prefix ("current"/"claim" parse as no ordinal), so every listing
    * filter below keys on `ordinalOf(n).isDefined`, never on the bare
    * prefix. */
  def ordinalOf(genName: String): Option[Long] = {
    val stripped =
      if (genName.startsWith(GenPrefix)) Some(genName.stripPrefix(GenPrefix))
      else if (genName.startsWith(LegacyGenPrefix))
        Some(genName.stripPrefix(LegacyGenPrefix))
      else None
    stripped.flatMap(r =>
      scala.util.Try(r.takeWhile(_ != '_').toLong).toOption)
  }

  /** Whether a root entry NAME is a generation directory (either
    * spelling) — the one test every sweep/keep filter uses. */
  def isGenName(n: String): Boolean = ordinalOf(n).isDefined

  /** The live generation's directory NAME, if the artifact uses the
    * versioned layout. Pointer writes are atomic (temp + rename), so a
    * read sees a complete value or no file; an empty/torn read (possible
    * only on a filesystem without atomic rename) retries briefly then
    * fails loudly — treating it as absent would silently serve a stale
    * legacy root. */
  def currentGen(spark: SparkSession, path: String): Option[String] = {
    val fs = fsOf(spark, path)
    val p = new Path(path, PointerFile)
    var attempt = 0
    while (true) {
      if (!fs.exists(p)) return None
      val content =
        try {
          val in = fs.open(p)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => return None }
      content match {
        case Some(s) if s.nonEmpty => return Some(s)
        case _ if attempt < 5 => attempt += 1; Thread.sleep(20L << attempt)
        case _ => throw new IllegalStateException(
          s"artifact pointer $p is unreadable (empty/torn) after retries; " +
            s"restore it to name one _gen_* directory under $path")
      }
    }
    None // unreachable
  }

  /** The directory a reader should plan against: the live generation
    * under a versioned root, or the root itself (legacy flat layout). */
  def resolve(spark: SparkSession, path: String): String =
    currentGen(spark, path).map(g => s"$path/$g").getOrElse(path)

  /** Pin a root's live generation BEFORE reading it: (root, the loaded
    * pointer — the commit's CAS expectation, the exact directory reads
    * should plan against). Re-reading the pointer at commit time would
    * make the CAS vacuous: it would "expect" whatever is current then,
    * silently folding a delta onto a base that raced out from under the
    * reads. */
  def pinGen(spark: SparkSession, root: String)
      : (String, Option[String], String) = {
    val loaded = currentGen(spark, root)
    (root, loaded, loaded.map(g => s"$root/$g").getOrElse(root))
  }

  /** A fresh generation directory for a writer to fill — ordinal one
    * above the generation it loaded (`loaded`), uuid-suffixed so two
    * racing writers never collide on the directory (the pointer CAS in
    * [[commitGen]] is what serializes them, not the name). */
  def newGenDir(spark: SparkSession, path: String,
                loaded: Option[String]): String = {
    val next = loaded.flatMap(ordinalOf).getOrElse(0L) + 1L
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    s"$path/$GenPrefix${next}_$uuid"
  }

  /** Create-exclusive test-and-set on the commit claim (see
    * `EntityTable.tryClaimArrival` for the local-FS O_EXCL rationale). */
  private def tryClaim(fs: FileSystem, claim: Path): Boolean =
    if (claim.toUri.getScheme == null || claim.toUri.getScheme == "file")
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(claim.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false // root not created yet
      }
    else
      try { fs.create(claim, false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }

  /** Atomic pointer write: temp + rename-with-overwrite (the
    * `EntityTable.writeMarker` idiom). */
  private def writePointer(spark: SparkSession, path: String,
                           genName: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new Path(path, PointerFile)
    val tmp = new Path(path,
      s"$PointerFile.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(genName.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch { case e: Throwable => fs.delete(tmp, false); throw e }
  }

  /** Compare-and-swap commit of a written generation:
    *
    *  1. acquire the `_gen_claim` (create-exclusive; brief retry loop so
    *     two writers committing at the same instant serialize rather
    *     than one failing on the claim alone);
    *  2. verify the pointer still names `expected` — the generation this
    *     writer loaded and folded its delta onto. If it moved, a
    *     concurrent update won the race: delete OUR generation and fail
    *     LOUDLY — the delta was not applied and must be re-run against
    *     the new version. Silent last-swap-wins is exactly the data-loss
    *     mode this protocol exists to remove;
    *  3. flip the pointer (atomic rename);
    *  4. sweep every generation that is neither the new one nor
    *     `expected` — crashed writers' orphans and generations older
    *     than the displaced one (retention: exactly one displaced
    *     generation stays for in-flight readers);
    *  5. release the claim.
    *
    * The claim guards only steps 2–4 (milliseconds), so a stale claim
    * from a crash in that window is unlikely; if present, the error
    * names the file and the recovery step. */
  def commitGen(spark: SparkSession, path: String, genDir: String,
                expected: Option[String]): Unit = {
    val fs = fsOf(spark, path)
    val claim = new Path(path, ClaimFile)
    var attempts = 0
    while (!tryClaim(fs, claim)) {
      attempts += 1
      if (attempts > 100) throw new IllegalStateException(
        s"cannot acquire commit claim $claim after ${attempts - 1} retries — " +
          s"a concurrent commit is in flight, or a crashed writer left the " +
          s"claim behind (safe to delete after confirming no " +
          s"index-update/remove/build is running on $path)")
      Thread.sleep(100L)
    }
    try {
      val cur = currentGen(spark, path)
      if (cur != expected) {
        fs.delete(new Path(genDir), true)
        throw new IllegalStateException(
          s"concurrent writer detected on artifact $path: generation " +
            s"advanced from ${expected.getOrElse("<legacy>")} to " +
            s"${cur.getOrElse("<legacy>")} while this writer folded its " +
            s"delta. The delta was NOT applied — re-run the " +
            s"update/remove against the new version (FIXTURES.md §10)")
      }
      val genName = new Path(genDir).getName
      // A staged generation carries NO claim while being filled (only
      // this commit section does), so an `index-gc` running in the
      // staging window sees it as indistinguishable from a crashed
      // writer's orphan and may sweep it. The pointer has not moved, so
      // the CAS above still passes — without this check the flip would
      // point `_gen_current` at a deleted (or half-deleted) directory
      // while both commands report success. Verify the staged directory
      // survived, INSIDE the claim, so the race degrades to the
      // protocol's fail-loud mode instead of silent corruption.
      if (!fs.exists(new Path(genDir)))
        throw new IllegalStateException(
          s"staged generation $genDir was swept by a concurrent index-gc " +
            s"before this commit could claim it — the delta was NOT " +
            s"applied; re-run the update/build (and run index-gc only in " +
            s"windows with no in-flight writers, or without --all)")
      writePointer(spark, path, genName)
      val keep = Set(Some(genName), expected).flatten
      fs.listStatus(new Path(path)).foreach { s =>
        val n = s.getPath.getName
        if (isGenName(n) && !keep(n)) fs.delete(s.getPath, true)
      }
    } finally fs.delete(claim, false)
  }

  /** Commit MANY staged generations (one per shard root) as a single
    * all-or-nothing pointer transaction — the multi-shard commit a
    * sharded artifact's update/remove needs. A sequential per-shard
    * [[commitGen]] loop has a partial-failure window: a crash (or one
    * lost CAS) mid-loop leaves the delta applied to some shards but not
    * others, and re-running then either trips the disjoint-ids guard or
    * (with the guard waived) duplicates the already-committed shards'
    * rows. Here:
    *
    *  1. ONE claim is taken at `claimDir` (the artifact base — every
    *     sharded writer serializes on it, so two multi-shard commits
    *     can never interleave);
    *  2. EVERY commit's precondition is verified before ANY pointer
    *     moves: the shard pointer still names the generation the writer
    *     folded onto, and the staged directory survived (the index-gc
    *     staging race, same as [[commitGen]]);
    *  3. only then do all pointers flip — each flip is one atomic
    *     rename of a few bytes, so the all-flips window is
    *     milliseconds of pure metadata (no corpus I/O interleaves);
    *  4. per-root sweeps run last (non-semantic cleanup).
    *
    * If ANY precondition fails, every staged generation is deleted and
    * the call throws with the delta UNAPPLIED EVERYWHERE — re-run it.
    * A crash inside the all-flips window itself can still leave a
    * partial commit (pointer flips cannot be made jointly atomic on a
    * filesystem), but the window excludes all data writes and renames;
    * RECOVERY: `index-remove` the delta's ids (remove is idempotent on
    * ids absent from untouched shards), then re-run the update. */
  def commitGenAll(spark: SparkSession, claimDir: String,
                   commits: Seq[(String, String, Option[String])]): Unit = {
    if (commits.isEmpty) return
    val fs = fsOf(spark, claimDir)
    val claim = new Path(claimDir, ClaimFile)
    var attempts = 0
    while (!tryClaim(fs, claim)) {
      attempts += 1
      if (attempts > 100) throw new IllegalStateException(
        s"cannot acquire commit claim $claim after ${attempts - 1} retries — " +
          s"a concurrent sharded commit is in flight, or a crashed writer " +
          s"left the claim behind (safe to delete after confirming no " +
          s"index-update/remove/build is running under $claimDir)")
      Thread.sleep(100L)
    }
    try {
      // Phase 1: verify EVERY precondition before ANY pointer moves.
      val failures = commits.flatMap { case (root, genDir, expected) =>
        val cur = currentGen(spark, root)
        if (cur != expected) Some(
          s"$root: generation advanced from ${expected.getOrElse("<legacy>")} " +
            s"to ${cur.getOrElse("<legacy>")}")
        else if (!fs.exists(new Path(genDir))) Some(
          s"$root: staged generation $genDir was swept (index-gc racing " +
            s"the staging window?)")
        else None
      }
      if (failures.nonEmpty) {
        commits.foreach { case (_, genDir, _) =>
          fs.delete(new Path(genDir), true)
        }
        throw new IllegalStateException(
          s"sharded commit aborted — the delta was NOT applied to ANY " +
            s"shard; re-run it against the current version. Failed " +
            s"preconditions: ${failures.mkString("; ")} (FIXTURES.md §10)")
      }
      // Phase 2: all pointers flip (atomic renames, metadata-only).
      commits.foreach { case (root, genDir, _) =>
        writePointer(spark, root, new Path(genDir).getName)
      }
      // Phase 3: per-root retention sweeps.
      commits.foreach { case (root, genDir, expected) =>
        val keep = Set(Some(new Path(genDir).getName), expected).flatten
        fs.listStatus(new Path(root)).foreach { s =>
          val n = s.getPath.getName
          if (isGenName(n) && !keep(n)) fs.delete(s.getPath, true)
        }
      }
    } finally fs.delete(claim, false)
  }

  /** Maintenance sweep (`index-gc`): delete non-live generations
    * WITHOUT committing anything — for read-mostly artifacts whose
    * crashed-writer leftovers would otherwise linger until the next
    * successful commit. Runs under the same create-exclusive claim as
    * [[commitGen]], so it can never race a commit's pointer flip.
    * `keepDisplaced = true` (the default CLI behavior) retains the
    * highest-ordinal non-live generation — the in-flight-reader
    * retention the serve ∥ update contract promises; pass false (CLI
    * `--all=true`) only inside a maintenance window with no readers.
    * Returns the deleted generation names. Legacy flat artifacts (no
    * pointer) have nothing to sweep.
    *
    * Above-live generations need one more distinction: a crashed
    * writer's orphan and an IN-FLIGHT writer's still-being-staged
    * generation look identical (staging holds no claim — only the
    * commit does). [[commitGen]] fails loudly if its staged directory
    * vanished, so the race is never silent, but sweeping a live staging
    * still wastes the writer's work; the default sweep therefore skips
    * above-live generations modified within [[StagingGraceMs]] (a
    * writer actively filling a directory keeps its mtime fresh), and
    * only `--all=true` — the no-writers maintenance window — ignores
    * the grace period. */
  val StagingGraceMs: Long = 60L * 60L * 1000L // 1 h

  /** Max modification time across a directory tree (the directory
    * itself, every file, every subdirectory) — the staging-freshness
    * signal [[sweep]] uses. A writer actively filling a generation
    * keeps SOME entry's mtime fresh (task files land continuously) even
    * where the top-level directory mtime froze at job start. Bounded:
    * called only for above-live generation candidates, which are rare
    * (a crashed writer's orphan or one in-flight staging). */
  private def treeMaxMtime(fs: FileSystem, p: Path): Long = {
    val self = fs.getFileStatus(p)
    if (!self.isDirectory) self.getModificationTime
    else (self.getModificationTime +:
      fs.listStatus(p).map(s =>
        if (s.isDirectory) treeMaxMtime(fs, s.getPath)
        else s.getModificationTime).toSeq).max
  }

  def sweep(spark: SparkSession, path: String,
            keepDisplaced: Boolean,
            stagingGraceMs: Long = StagingGraceMs): Seq[String] = {
    val fs = fsOf(spark, path)
    if (!fs.exists(new Path(path))) throw new IllegalArgumentException(
      s"no artifact at $path — nothing to sweep (check the --path)")
    val claim = new Path(path, ClaimFile)
    var attempts = 0
    while (!tryClaim(fs, claim)) {
      attempts += 1
      if (attempts > 100) throw new IllegalStateException(
        s"cannot acquire commit claim $claim — a commit is in flight, or " +
          s"a crashed writer left the claim behind (safe to delete after " +
          s"confirming no index-update/remove/build is running on $path)")
      Thread.sleep(100L)
    }
    try {
      currentGen(spark, path) match {
        case None => Seq.empty
        case Some(cur) =>
          // the DISPLACED generation is the one the pointer moved FROM:
          // the highest ordinal BELOW the live one. Crashed-writer
          // orphans sit ABOVE it (they loaded the live generation, so
          // newGenDir gave them live+1, and they never committed) —
          // keeping "the newest non-live" would retain the garbage and
          // delete the generation in-flight readers depend on.
          val curOrd = ordinalOf(cur).getOrElse(Long.MaxValue)
          val statuses = fs.listStatus(new Path(path))
            .filter(s => isGenName(s.getPath.getName) &&
              s.getPath.getName != cur)
          val orphans: Seq[String] = statuses.map(_.getPath.getName)
            .sortBy(n => ordinalOf(n).getOrElse(-1L)).toSeq
          val displaced =
            if (keepDisplaced)
              orphans.filter(n => ordinalOf(n).exists(_ < curOrd)).lastOption
            else None
          // above-live + recently modified = possibly a writer mid-stage
          // (see StagingGraceMs) — spare it outside --all. Freshness is
          // the MAX mtime across the staged TREE, not the generation
          // directory's own mtime: on HDFS a directory's mtime moves only
          // when direct children are added/removed, and Spark creates
          // `_temporary` once at job start — a long-running staged write
          // would look stale at the top level while its task files are
          // seconds old. Computed lazily, only for above-live candidates.
          val now = System.currentTimeMillis()
          val inGrace: String => Boolean = n =>
            keepDisplaced && ordinalOf(n).exists(_ > curOrd) &&
              now - treeMaxMtime(fs, new Path(path, n)) < stagingGraceMs
          val victims = orphans.filterNot(displaced.contains)
            .filterNot(inGrace)
          victims.foreach(n => fs.delete(new Path(path, n), true))
          victims
      }
    } finally fs.delete(claim, false)
  }

  /** Generation-health counters for `index-describe`: total gen_* dirs,
    * orphans (any generation that is not the live one — a crashed or
    * raced writer's leftover, or the one retained displaced generation),
    * and whether a commit claim is present. Purely informational; the
    * next successful commit sweeps everything but the live and displaced
    * generations. */
  def generationReport(spark: SparkSession, path: String)
      : Option[(String, Seq[String], Boolean)] =
    currentGen(spark, path).map { cur =>
      val fs = fsOf(spark, path)
      val gens = fs.listStatus(new Path(path)).map(_.getPath.getName)
        .filter(isGenName).toSeq.sorted
      (cur, gens.filterNot(_ == cur),
        fs.exists(new Path(path, ClaimFile)))
    }
}
