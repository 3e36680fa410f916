package graft.functions

import org.apache.spark.sql.SparkSession

/** Torn-shard-safe replay detection for the additive count-shard
  * appenders ([[TextAnalysis.dsirCountsAppend]], [[Sketches.cmsAppend]]).
  *
  * A bare `fs.exists(shardDir)` replay check has a CRASH HOLE: a writer
  * killed mid-`write.parquet` leaves the directory present but
  * incomplete (no `_SUCCESS` committer marker, possibly `_temporary`
  * debris), so the replayed batch would be SKIPPED and its counts lost
  * forever — silent, and additive tables can't detect a missing
  * addend. The committer only writes `_SUCCESS` after every task
  * committed, so that marker — not the directory — is the "this shard
  * is complete" signal (the same reasoning behind the postings index's
  * manifest-referenced reads).
  */
object ShardWrite {

  /** Claim `shard` for writing: false iff a COMPLETE shard (directory +
    * `_SUCCESS`) already exists (true replay → skip); a torn shard
    * (directory without the marker) is deleted so the caller's write
    * starts clean. */
  def claim(spark: SparkSession, shard: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(shard)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return true
    if (fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) return false
    // torn: a previous writer died mid-commit — rewrite from scratch
    fs.delete(p, true)
    true
  }

  /** Read a shard table that may not exist yet — the OPTIONAL-CHANNEL
    * read every tombstone-aware reader needs: a maintained table whose
    * retire channel was never written must read as "nothing retired"
    * (zero rows of the declared schema), never a missing-path throw.
    * Explicit schema for the same reason the shard readers all carry
    * one: an existing-but-all-empty channel must not fail inference. */
  def readOrEmpty(spark: SparkSession, path: String,
                  schema: String): org.apache.spark.sql.DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }
}
