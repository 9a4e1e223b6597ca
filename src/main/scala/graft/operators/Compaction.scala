package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance operator every long-lived
  * ingest pipeline needs: streaming/incremental appends (DedupAppend per
  * micro-batch, partitioned event writes) accumulate files far below the
  * ideal scan unit, and scan cost at 100 TB is dominated by file-open and
  * footer-read overhead once files shrink below ~100 MB.
  *
  * Strategy: measure the table's on-disk bytes from the file listing (no
  * data read), rewrite with `repartition(ceil(bytes / targetFileBytes))`
  * (round-robin — even output sizes, unlike `coalesce` which merges
  * neighbors and preserves skew), and write to a NEW directory: compaction
  * is a rewrite-then-swap protocol, never an in-place overwrite of a
  * directory a concurrent reader may be scanning. The swap (atomic rename
  * or catalog pointer flip) is the caller's last step.
  *
  * Scale shape: one full-table read + one shuffle + one write — the
  * theoretical minimum for re-bucketing bytes. Partitioned tables compact
  * per partition (the unit of both the small-file problem and the swap),
  * preserving the partition layout for pruning.
  */
object Compaction {

  /** Total bytes of data files under `path` (recursive, dot-files and
    * _SUCCESS markers excluded) — listing only, no data read. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Data files under `path` (same exclusions). */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Compact the parquet table at `src` into `dest` with files of
    * ~`targetFileBytes`. Returns the number of output files written.
    * `sortCols` optionally restores a clustering order inside each output
    * file (min-max stats → row-group skipping on those columns). */
  def compact(spark: SparkSession, src: String, dest: String,
              targetFileBytes: Long, sortCols: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val bytes = dataBytes(spark, src)
    // clamp before .toInt: bytes/target can exceed Int range for tiny targets
    val nOut = math.min(Int.MaxValue.toLong,
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
    val df = spark.read.parquet(src)
    val re = df.repartition(nOut)
    val shaped = if (sortCols.nonEmpty) re.sortWithinPartitions(sortCols.map(col): _*) else re
    shaped.write.mode("overwrite").parquet(dest)
    dataFileCount(spark, dest)
  }

  /** Compact a `partitionBy(partCol)`-layout table partition-by-partition,
    * preserving the `partCol=value` directory structure (partition pruning
    * keeps working on the compacted copy). Each partition is sized
    * independently — the hot-day/cold-day file-count skew that motivates
    * compaction also means one global repartition count would be wrong for
    * every partition. */
  def compactPartitioned(spark: SparkSession, src: String, dest: String,
                         partCol: String, targetFileBytes: Long): Long = {
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(partCol + "="))
      .sorted // deterministic processing order
    var written = 0L
    for (part <- parts)
      written += compact(spark, s"$src/$part", s"$dest/$part", targetFileBytes)
    written
  }
}
