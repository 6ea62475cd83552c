package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide session settings every runtime main (Bench, Verify, Tool,
  * Explain, the scale benches) applies on top of its contract knobs.
  * Each is scale-motivated (guide §6/§9), none is a local[32] tune:
  *
  *  - '''parallelPartitionDiscovery.threshold''': the partitioned
  *    artifact layouts (`cells/c_id=<cell>`, `shard=<s>`) put 64-256
  *    partition directories under every index root, and Spark's default
  *    threshold (32 paths) turns EVERY `spark.read.parquet` of such a
  *    root into a distributed listing JOB (~0.1-0.25 s of pure
  *    scheduling at any scale; a sharded serve issues S of them, and
  *    measured round 18 they were ~2 s of q194's 19 s). Driver-side
  *    listing of ≤1024 directories is microseconds on local FS and
  *    single-digit ms on object stores; grids larger than that still
  *    engage the parallel path.
  *  - '''fileoutputcommitter v2''': every engine write lands in a
  *    staging/generation directory that is published by an atomic
  *    rename or pointer flip (ArtifactStore/ShardedCommit/BulkSink), so
  *    v1's extra job-commit rename pass (one rename per task output,
  *    serial on the driver) buys no safety the artifact protocol does
  *    not already provide — it only doubles the metadata ops of the
  *    256-directory staged writes.
  *  - '''zstd parquet''': smaller artifacts at similar read speed
  *    (guide §6); content is unchanged, so save→load exactness and
  *    every oracle comparison are unaffected.
  */
object EngineConf {
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.sql.parquet.compression.codec", "zstd")
}
