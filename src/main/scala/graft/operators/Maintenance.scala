package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ingest maintenance loop: [[DedupAppend]] and [[Compaction]] composed
  * into one cycle. Every micro-batch append creates at least one new file,
  * so a long-lived keyed table drifts toward thousands of far-below-scan-
  * unit files — the append operator creates the small-file problem and the
  * compactor solves it; this wires them so neither has to be remembered
  * separately (the round-3 review's "both operators exist, unwired").
  *
  * Protocol (single-writer, same assumption DedupAppend already documents):
  * append the batch idempotently; if the table now exceeds `maxFiles` data
  * files, rewrite it to ~`targetFileBytes` files in a sibling directory and
  * swap directories. The swap is delete-then-rename here (plain parquet on
  * a filesystem); in a catalog-backed table format the same step is an
  * atomic pointer flip, which is what makes the rewrite safe under
  * concurrent readers — documented, not simulated.
  */
object Maintenance {

  /** One ingest cycle: idempotent dedup-append of `batch`, then compaction
    * when the file count passed `maxFiles`. Returns the post-cycle data
    * file count (≤ max(1, ceil(bytes/targetFileBytes)) right after a
    * compacting cycle). */
  def appendCycle(spark: SparkSession, batch: DataFrame, path: String,
                  keys: Seq[String], tieBreak: Seq[String],
                  maxFiles: Long, targetFileBytes: Long): Long = {
    require(maxFiles > 0, s"maxFiles must be > 0, got $maxFiles")
    DedupAppend.append(spark, batch, path, keys, tieBreak)
    if (Compaction.dataFileCount(spark, path) > maxFiles) {
      val tmp = path + "__compacting"
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(tmp), true)
      Compaction.compact(spark, path, tmp, targetFileBytes)
      // swap (write above is an action — tmp is fully materialized here)
      fs.delete(new Path(path), true)
      fs.rename(new Path(tmp), new Path(path))
    }
    Compaction.dataFileCount(spark, path)
  }
}
