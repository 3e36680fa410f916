package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Lake maintenance for the micro-batch sink's small-files problem: a
  * 10-second append cadence ([[TickIngest.startLakeSink]]) accretes one
  * parquet file per batch per symbol — ~8.6k files/symbol/day — and
  * every downstream scan pays per-file open/footer costs while the
  * driver pays per-file listing. Compaction rewrites each symbol
  * partition into ⌈bytes/target⌉ files sized for the scan-side
  * `maxPartitionBytes` split.
  *
  * Consistency contract (plain parquet directories — no table format, so
  * no snapshot isolation): the compacted files are fully written into a
  * hidden temp dir FIRST, and the swap is LOSS-PROOF by ordering —
  * compacted files rename IN first (uniquely stamped names), originals
  * delete only after EVERY rename succeeded. Any crash or rename
  * failure inside the window therefore leaves all originals intact;
  * the worst case is DUPLICATED rows (already-renamed compacted files
  * alongside originals), bounded to one partition and repairable by a
  * dedup rewrite — rows are never lost, and a stale `.compact_tmp_`
  * dir from a crashed run holds only copies of still-present originals,
  * so deleting it on the next run is safe. A failed rename rolls the
  * already-renamed files back out before aborting. Readers listing
  * mid-swap can still observe the duplicate window — run compaction in
  * a maintenance window, pause the sink for the touched symbols, or
  * adopt a transactional table format when concurrent readers matter.
  *
  * The rewrite reads EXACTLY the file list captured before the job (not
  * the live directory): a file the 10-second sink appends concurrently
  * is neither compacted nor deleted — without that, its rows would be
  * folded into the compacted output while the original survived the
  * swap, duplicating them unconditionally.
  *
  * Scale shape: one partition at a time — the rewrite is a single
  * coalesce(⌈bytes/target⌉) job over one symbol's files; driver FS work
  * is O(files in that partition), never the whole lake. */
object LakeMaintenance {

  /** Compact every `symbol=` partition under `path` that holds more than
    * `maxFiles` parquet files. Returns (partitions compacted, files
    * before, files after). */
  def compactLake(spark: SparkSession, path: String,
                  targetBytes: Long = 128L << 20,
                  maxFiles: Int = 4): (Int, Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0, 0, 0)
    var parts = 0; var before = 0; var after = 0
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("symbol="))
      .foreach { p =>
        val files = fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        if (files.length > maxFiles) {
          val bytes = files.map(_.getLen).sum
          val n = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
          val tmp = new Path(root, s".compact_tmp_${p.getName}")
          fs.delete(tmp, true) // stale temp: copies of still-present originals
          // rewrite EXACTLY the captured file list (see consistency
          // contract); the data files carry no partition column — it
          // lives in the dir name, which stays put
          spark.read.parquet(files.map(_.getPath.toString): _*)
            .coalesce(n).write.mode("overwrite").parquet(tmp.toString)
          val compacted = fs.listStatus(tmp)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          // COMMIT ORDER — rename in first (stamped names can't collide
          // with a prior run's output), delete originals only after every
          // rename succeeded; see the loss-proof contract above
          val stamp = java.lang.Long.toHexString(System.nanoTime())
          val renamed = scala.collection.mutable.ArrayBuffer.empty[Path]
          val allRenamed = compacted.zipWithIndex.forall { case (f, i) =>
            val dest = new Path(p, f"compacted-$stamp-$i%05d.parquet")
            val ok = fs.rename(f.getPath, dest)
            if (ok) renamed += dest
            ok
          }
          if (!allRenamed) {
            renamed.foreach(fs.delete(_, false)) // originals all intact
            fs.delete(tmp, true)
            throw new java.io.IOException(
              s"compactLake: rename into $p failed; partition left unchanged")
          }
          files.foreach(f => fs.delete(f.getPath, false))
          fs.delete(tmp, true)
          parts += 1; before += files.length; after += compacted.length
        }
      }
    (parts, before, after)
  }
}
