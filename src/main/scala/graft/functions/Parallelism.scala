package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional parallelism unlock for narrow local scans.
  *
  * A single-file, single-row-group parquet fixture yields ONE scan
  * partition, so a scan→project pipeline runs on one core no matter how
  * many the session has — at corpus scale the file splits already
  * saturate the cluster and this repartition is SKIPPED (the condition
  * compares the estimated scan width against the session's
  * shuffle-partition count). Callers with a downstream shuffle pass that
  * shuffle's key so the exchange is REUSED, not added; expression-only
  * pipelines use the keyless round-robin form.
  *
  * The scan width is ESTIMATED from logical-plan byte stats (file sizes
  * the relation already listed) rather than `df.rdd`, which would force
  * eager physical planning per call. Stats at or above
  * `defaultSizeInBytes` mean UNKNOWN (RDD-backed relations default
  * there; file scans and LocalRelations report real sizes) — unknown
  * SKIPS the repartition: the failure mode of skipping is lost local
  * parallelism on a rare input shape, while the failure mode of
  * repartitioning is a full RAW-data shuffle below the map-side partial
  * aggregation at corpus scale — strictly worse than the shuffle the
  * downstream aggregation would do on its compacted output.
  */
object Parallelism {

  def ensureParallel(df: DataFrame, key: Column*): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val p = conf.numShufflePartitions
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val statsKnown = size < BigInt(conf.defaultSizeInBytes)
    val estScanParts = (size / math.max(1L, conf.filesMaxPartitionBytes)).toLong + 1
    if (statsKnown && estScanParts < p) {
      if (key.isEmpty) df.repartition(p) else df.repartition(p, key: _*)
    } else df
  }
}
