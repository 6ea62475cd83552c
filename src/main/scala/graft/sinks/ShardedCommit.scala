package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared staging/commit machinery of every SHARDED artifact — the
  * 100 TB rewrite-unit layout (reference anchor: one file set per
  * locality group, `KM/output/framework/KijiHFileOutputFormat.java:122-186`,
  * generalized to per-shard generational roots): a corpus-sized surface
  * splits into S independent roots `path/<family>/<s>/_gen_*`, a delta
  * rewrites only the shards it routes to, and ALL touched roots flip in
  * one all-or-nothing pointer transaction ([[ArtifactStore.commitGenAll]]
  * under the artifact-base claim).
  *
  * First extracted from the BM25 tier (`Retrieval.commitBm25Shards`,
  * round 17) when the doc-tier dedup artifacts (LSH banded index, CDC
  * chunk index, SemDeDup assign surface) adopted the same layout — the
  * commit choreography is identical across tiers and MUST stay so (the
  * staging-grace, empty-surface, and co-swap contracts are easy to get
  * subtly wrong three times):
  *
  *  1. every surface stages as ONE `partitionBy("shard")` job (never a
  *     write per shard — S jobs of planning overhead for one job's I/O);
  *  2. each shard's staged partition directories RENAME into that
  *     shard's fresh generation — surfaces sharing a family swap
  *     TOGETHER inside one generation (the cells+codes lesson: a row in
  *     one surface whose sibling rows are in another generation is a
  *     silent-drop hazard);
  *  3. a shard with no staged rows gets an EXPLICIT schema-bearing
  *     empty surface, so later readers/updates never hit a missing
  *     directory (and schema discovery survives a rowless shard);
  *  4. [[ArtifactStore.commitGenAll]] verifies every CAS precondition
  *     before ANY pointer flips — a lost race aborts with the delta
  *     unapplied EVERYWHERE.
  */
object ShardedCommit {

  /** [[ArtifactStore.pinGen]]'s result: (root, loaded pointer — the CAS
    * expectation, resolved directory reads planned against). */
  type Pin = (String, Option[String], String)

  /** One shard-keyed surface: `df` must carry an int `shard` column
    * routing each row; `empty` supplies the schema-bearing zero-row
    * frame written where a shard has no staged rows. `wave` orders the
    * staging: surfaces stage concurrently WITHIN a wave, waves run in
    * ascending order — a surface derived from another surface's
    * persisted lineage stages in a later wave so its job plans against
    * the already-materialized cache instead of recomputing the shared
    * ancestor (the saveBm25Index wave pattern, generalized). */
  final case class Surface(name: String, df: DataFrame,
                           empty: () => DataFrame, wave: Int = 0)

  /** A family of shard roots swapping the same surfaces together:
    * every `(shardId, pin)` gets one fresh generation holding one
    * directory per surface. */
  final case class Family(shards: Seq[(Int, Pin)], surfaces: Seq[Surface])

  /** The 1-row shard-grid descriptor every sharded artifact writes at
    * `path/meta` (grid size is a build-time constant: routing hashes
    * mod it, so it can never change without a rebuild). */
  def writeMeta(spark: SparkSession, path: String, numShards: Int): Unit = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    import spark.implicits._
    Seq(numShards).toDF("num_shards")
      .coalesce(1).write.mode("overwrite")
      .options(ArtifactStore.InPlaceCommit).parquet(s"$path/meta")
    writeMetaMarker(spark, path, numShards)
  }

  /** Grid-size fast path: a tiny `meta/_num_shards` text file written
    * beside the parquet meta. Every load/update/serve of a sharded
    * artifact starts with the grid size, and reading it through
    * `spark.read.parquet(...).head()` is a full Spark JOB (~60-150 ms
    * of scheduling for one int, several times per lifecycle op —
    * measured round 18). The marker is one driver-side read; the
    * parquet meta stays authoritative for legacy artifacts and
    * schema-bearing readers. Underscore-prefixed, so Spark listings of
    * the meta directory never surface it. */
  private val MetaMarker = "_num_shards"

  def writeMetaMarker(spark: SparkSession, path: String,
                      numShards: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta/$MetaMarker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(numShards.toString.getBytes("UTF-8")) finally out.close()
  }

  def numShards(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta/$MetaMarker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // open directly and treat FileNotFound as the fallback signal — the
    // exists()+open() form paid TWO metadata RPCs per read on object
    // stores (ADVICE round 18); one open is the whole fast path
    val fast =
      try {
        val in = fs.open(p)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        txt.toIntOption // empty/torn marker → parquet fallback
      } catch { case _: java.io.FileNotFoundException => None }
    fast.getOrElse(
      spark.read.parquet(s"$path/meta")
        .select(org.apache.spark.sql.functions.col("num_shards"))
        .head().getInt(0))
  }

  /** How a [[SegFamily]]'s fresh segment joins each shard's manifest:
    * REPLACE makes it the only live segment (build / compact / remove —
    * the full-surface writes), APPEND adds it after the pinned
    * generation's list (the O(delta) update — requires the pinned
    * generation to be segmented already; callers migrate legacy roots
    * with one REPLACE write first). */
  sealed trait SegMode
  case object SegReplace extends SegMode
  case object SegAppend extends SegMode

  /** A [[Family]] committing through the SEGMENTED layout
    * ([[graft.sinks.SegmentStore]]): each touched shard gets one new
    * immutable `_seg_*` data dir plus a manifest-only generation. */
  final case class SegFamily(shards: Seq[(Int, Pin)],
                             surfaces: Seq[Surface], mode: SegMode)

  /** Stage every family's surfaces, assemble per-shard generations, and
    * flip all pointers in one transaction. `singletons` are bounded
    * rollup roots (e.g. BM25's 1-row stats) committing in the same
    * transaction as single-file generations. */

  /** Stage every surface concurrently: the per-surface staging writes
    * are independent jobs, so overlapping them collapses their driver
    * scheduling / output-commit latencies (guide §2.6 — measured round
    * 18: the sequential form serialized 2-4 write jobs per commit).
    * `extras` are bounded independent writes (the singleton rollup
    * roots) folded into the FIRST wave instead of serializing after the
    * renames. Lambda isolation via
    * [[graft.operators.Clustering.concurrentFrames]] keeps
    * concurrently-evaluating plans from sharing `NamedLambdaVariable`
    * slots. */
  private def stageAll(surfs: Seq[(Surface, String)],
                       extras: Seq[(DataFrame, DataFrame => Unit)]): Unit = {
    val byWave = surfs.groupBy(_._1.wave).toSeq.sortBy(_._1)
    if (byWave.isEmpty) {
      graft.operators.Clustering.concurrentFrames(extras.map(_._1)) {
        (i, df) => extras(i)._2(df)
      }
      return
    }
    byWave.zipWithIndex.foreach { case ((_, ws), wi) =>
      val ex = if (wi == 0) extras else Nil
      graft.operators.Clustering.concurrentFrames(
        ws.map(_._1.df) ++ ex.map(_._1)) { (i, df) =>
        if (i < ws.size)
          // explicit count: a bare keyed repartition lets AQE coalesce
          // the staging to one serial-writer task (Clustering.writePar)
          df.repartition(graft.operators.Clustering.writePar(df),
              org.apache.spark.sql.functions.col("shard"))
            .write.mode("overwrite").partitionBy("shard").parquet(ws(i)._2)
        else ex(i - ws.size)._2(df)
      }
      ()
    }
  }

  def commit(spark: SparkSession, path: String,
             families: Seq[Family],
             singletons: Seq[(DataFrame, Pin)] = Nil): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staged: Seq[(Family, Seq[(Surface, String)])] =
      families.zipWithIndex.map { case (fam, fi) =>
        fam -> fam.surfaces.zipWithIndex.map { case (surf, si) =>
          surf -> s"$path/__stage_${tag}_${fi}_${si}_${surf.name}"
        }
      }
    try {
      // singleton rollup writes overlap the wave-0 stagings: their
      // generation dirs are named up front, written concurrently, and
      // committed in the same pointer transaction
      val singletonGens = singletons.map { case (df, (root, loaded, _)) =>
        (df, root, loaded, ArtifactStore.newGenDir(spark, root, loaded))
      }
      stageAll(staged.flatMap(_._2), singletonGens.map {
        case (df, _, _, gen) =>
          df -> ((d: DataFrame) =>
            d.coalesce(1).write.mode("overwrite").parquet(gen))
      })
      val commits = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[String])]
      staged.foreach { case (fam, surfs) =>
        fam.shards.foreach { case (sh, (root, loaded, _)) =>
          val gen = ArtifactStore.newGenDir(spark, root, loaded)
          fs.mkdirs(new org.apache.hadoop.fs.Path(gen))
          surfs.foreach { case (surf, stage) =>
            val src = new org.apache.hadoop.fs.Path(s"$stage/shard=$sh")
            if (fs.exists(src))
              require(fs.rename(src,
                  new org.apache.hadoop.fs.Path(s"$gen/${surf.name}")),
                s"sharded commit: cannot stage $src as $gen/${surf.name}")
            else
              surf.empty().coalesce(1).write.mode("overwrite")
                .parquet(s"$gen/${surf.name}")
          }
          commits += ((root, gen, loaded))
        }
      }
      singletonGens.foreach { case (_, root, loaded, gen) =>
        commits += ((root, gen, loaded))
      }
      ArtifactStore.commitGenAll(spark, path, commits.toSeq)
    } finally staged.foreach { case (_, surfs) =>
      surfs.foreach { case (_, stage) =>
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      }
    }
  }

  /** The segmented twin of [[commit]] — same staging (one
    * `partitionBy("shard")` job per surface), but each shard's staged
    * partitions land in a fresh IMMUTABLE `_seg_*` dir and the new
    * generation holds only the manifest naming the live segment list
    * (see [[graft.sinks.SegmentStore]]): write volume is the staged
    * rows, never the shard's prior surface. The pointer transaction is
    * the same [[ArtifactStore.commitGenAll]]; after it, each root's
    * orphaned segments (displaced-out manifests' data past the staging
    * grace) are swept. */
  def commitSegmented(spark: SparkSession, path: String,
                      families: Seq[SegFamily],
                      singletons: Seq[(DataFrame, Pin)] = Nil): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staged: Seq[(SegFamily, Seq[(Surface, String)])] =
      families.zipWithIndex.map { case (fam, fi) =>
        fam -> fam.surfaces.zipWithIndex.map { case (surf, si) =>
          surf -> s"$path/__stage_${tag}_${fi}_${si}_${surf.name}"
        }
      }
    try {
      // singleton rollup writes overlap the wave-0 stagings (see commit)
      val singletonGens = singletons.map { case (df, (root, loaded, _)) =>
        (df, root, loaded, ArtifactStore.newGenDir(spark, root, loaded))
      }
      stageAll(staged.flatMap(_._2), singletonGens.map {
        case (df, _, _, gen) =>
          df -> ((d: DataFrame) =>
            d.coalesce(1).write.mode("overwrite").parquet(gen))
      })
      val commits = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[String])]
      val roots = scala.collection.mutable.ArrayBuffer.empty[String]
      staged.foreach { case (fam, surfs) =>
        fam.shards.foreach { case (sh, (root, loaded, pinnedGen)) =>
          val segName = SegmentStore.newSegName(spark, root)
          val segDir = s"$root/$segName"
          fs.mkdirs(new org.apache.hadoop.fs.Path(segDir))
          surfs.foreach { case (surf, stage) =>
            val src = new org.apache.hadoop.fs.Path(s"$stage/shard=$sh")
            if (fs.exists(src))
              require(fs.rename(src,
                  new org.apache.hadoop.fs.Path(s"$segDir/${surf.name}")),
                s"segmented commit: cannot stage $src as " +
                  s"$segDir/${surf.name}")
            else
              surf.empty().coalesce(1).write.mode("overwrite")
                .parquet(s"$segDir/${surf.name}")
          }
          val manifest = fam.mode match {
            case SegReplace => Seq(segName)
            case SegAppend =>
              val prev = SegmentStore.readManifest(spark, pinnedGen)
                .getOrElse(throw new IllegalStateException(
                  s"SegAppend on a LEGACY (unsegmented) root $root — " +
                    s"migrate it first with one full write (merge-mode " +
                    s"update, remove, or index-compact)"))
              prev :+ segName
          }
          val gen = ArtifactStore.newGenDir(spark, root, loaded)
          fs.mkdirs(new org.apache.hadoop.fs.Path(gen))
          SegmentStore.writeManifest(spark, gen, manifest)
          commits += ((root, gen, loaded))
          roots += root
        }
      }
      singletonGens.foreach { case (_, root, loaded, gen) =>
        commits += ((root, gen, loaded))
      }
      ArtifactStore.commitGenAll(spark, path, commits.toSeq)
      roots.distinct.foreach(r => SegmentStore.sweepOrphans(spark, r))
    } finally staged.foreach { case (_, surfs) =>
      surfs.foreach { case (_, stage) =>
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      }
    }
  }
}
