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
  * hidden temp dir FIRST, then the swap (delete originals, rename
  * compacted in) runs as fast FS metadata ops. A reader listing mid-swap
  * can observe a partially-swapped partition — run compaction in a
  * maintenance window, pause the sink for the touched symbols, or adopt
  * a transactional table format when concurrent readers matter. A crash
  * mid-swap is recoverable: originals and the `.compact_tmp_` dir never
  * hold *different* rows, only duplicated ones, and the temp dir name
  * marks it for cleanup/retry (hidden from Spark scans by the leading
  * dot).
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
        def parquetFiles = fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        val files = parquetFiles
        if (files.length > maxFiles) {
          val bytes = files.map(_.getLen).sum
          val n = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
          val tmp = new Path(root, s".compact_tmp_${p.getName}")
          fs.delete(tmp, true) // stale temp from a crashed prior run
          // rewrite THIS partition's rows only; the dir read drops the
          // partition column, which lives in the dir name and stays put
          spark.read.parquet(p.toString)
            .coalesce(n).write.mode("overwrite").parquet(tmp.toString)
          val compacted = fs.listStatus(tmp)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          // swap window: metadata ops only, all data already durable
          files.foreach(f => fs.delete(f.getPath, false))
          compacted.zipWithIndex.foreach { case (f, i) =>
            fs.rename(f.getPath, new Path(p, f"compacted-$i%05d.parquet"))
          }
          fs.delete(tmp, true)
          parts += 1; before += files.length; after += compacted.length
        }
      }
    (parts, before, after)
  }
}
