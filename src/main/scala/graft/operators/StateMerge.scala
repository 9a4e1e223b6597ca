package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE maintained-table merge discipline shared by every
  * merge-by-re-aggregation state keeper (RollupState, the tumbling and
  * MV maintenance streams): read the table or bootstrap an empty frame
  * with the partial's schema, union the batch's partial in, re-combine,
  * and swap the result in via a temp-directory write + checked renames
  * (never an in-place overwrite of the directory being read).
  *
  * Replay safety: merge-by-sum is NOT idempotent — a foreachBatch retry
  * (batch re-run after a partial sink write but before the checkpoint
  * commits the offset) would double-count the batch's partials. Callers
  * on a streaming path therefore pass the micro-batch's `batchId`; it is
  * stamped into the state directory (an underscore-prefixed marker file
  * parquet readers skip) ATOMICALLY with the swap, and a batch whose id
  * is ≤ the stamped id is skipped as already merged. Batch callers omit
  * the id and keep plain merge semantics.
  *
  * Contract: batch ids are monotonic only within ONE checkpoint lineage,
  * so the state directory and its stream's checkpoint are a unit — they
  * are retained together or deleted together. Pointing a FRESH checkpoint
  * at existing state was already corruption before this guard (the new
  * stream re-reads everything and double-counts); the stamp does not
  * change that, it only closes the retry window within a lineage.
  *
  * Scale note: the temp-dir write + rename swap is the same checked
  * backup dance [[Maintenance.appendCycle]] uses — the state survives a
  * crash at any point under exactly one of its sibling names, and in a
  * catalog-backed table format the swap is one atomic pointer flip. The
  * write target is never the read source, so no materialization barrier
  * (localCheckpoint) is needed between read and overwrite.
  */
object StateMerge {

  private val MarkerName = "_graft_last_merged_batch"

  /** The batch id stamped in the state at `path`, if any. */
  def lastMergedBatch(spark: SparkSession, path: String): Option[Long] = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new Path(live, MarkerName)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Merge `partial` into the state table at `path` via `combine`.
    * `batchId` ≥ 0 marks a streaming micro-batch: replays (id ≤ the
    * stamped last-merged id) are skipped, and the new id is stamped
    * atomically with the swap. `batchId` < 0 (the default) is the plain
    * batch form with no replay tracking. */
  def mergeOverwrite(spark: SparkSession, partial: DataFrame, path: String,
                     batchId: Long = -1L)
                    (combine: DataFrame => DataFrame): Unit = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup0 = new Path(path + "__premerge")
    // crash recovery: a previous process that died BETWEEN the two swap
    // renames left the state under the backup name with the live path
    // absent — restore it, or this merge would silently bootstrap from
    // empty and lose the history
    if (!fs.exists(live) && fs.exists(backup0) && !fs.rename(backup0, live))
      throw new java.io.IOException(
        s"state merge recovery: could not restore $backup0 -> $live")
    val exists = fs.exists(live)
    if (batchId >= 0 && exists && lastMergedBatch(spark, path).exists(batchId <= _))
      return // replayed micro-batch: its partials are already in the state
    val existing =
      if (exists) spark.read.parquet(path)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), partial.schema)
    val merged = combine(existing.unionByName(partial))

    val tmp = new Path(path + "__merging")
    val backup = new Path(path + "__premerge")
    fs.delete(tmp, true); fs.delete(backup, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (batchId >= 0) {
      // the marker travels INSIDE the new state dir, so stamp and data
      // swap in the same rename — no window where one exists without the
      // other (parquet readers skip underscore-prefixed files)
      val out = fs.create(new Path(tmp, MarkerName), true)
      try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    // checked backup-rename swap (Maintenance.appendCycle's dance): a crash
    // or false return at any point leaves the state intact under exactly
    // one of the sibling names, never deleted-with-no-replacement
    if (exists && !fs.rename(live, backup))
      throw new java.io.IOException(s"state merge swap: rename $live -> $backup failed")
    if (!fs.rename(tmp, live)) {
      val restored = exists && fs.rename(backup, live)
      throw new java.io.IOException(
        s"state merge swap: rename $tmp -> $live failed" +
          (if (restored) "; previous state restored"
           else if (exists) s"; PREVIOUS STATE LEFT AT $backup"
           else ""))
    }
    if (exists && !fs.delete(backup, true))
      throw new java.io.IOException(
        s"state merge swap: could not remove backup $backup (state at $path is live and complete)")
  }
}
