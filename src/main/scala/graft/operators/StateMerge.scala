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
  * Single-writer ENFORCED by [[Lease]]: a second concurrent maintainer
  * fails cleanly at acquire instead of interleaving the swap dance.
  *
  * Scale note: the temp-dir write + rename swap is the shared
  * [[TableSwap]] dance ([[Maintenance.appendCycle]] uses the same
  * helper) — the state survives a
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
                     batchId: Long = -1L, owner: Option[String] = None)
                    (combine: DataFrame => DataFrame): Unit = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-writer ENFORCED (Lease): two interleaved merges would both
    // read the same pre-state and the second swap would drop the first's
    // partials — the second maintainer fails cleanly instead. Streaming
    // callers pass their checkpoint location as `owner` so a crashed
    // lineage's restart re-acquires its own stale lease (the replayed
    // merge is already a no-op under the batch-id stamp).
    Lease.withLease(fs, live, "state merge", owner) {
      mergeUnleased(spark, partial, live, fs, batchId)(combine)
    }
  }

  private def mergeUnleased(spark: SparkSession, partial: DataFrame, live: Path,
                            fs: org.apache.hadoop.fs.FileSystem, batchId: Long)
                           (combine: DataFrame => DataFrame): Unit = {
    val path = live.toString
    // siblings derive from the NORMALIZED path (Path strips a trailing
    // slash) — string concat on a trailing-slash path would nest them
    // INSIDE the live dir and every swap rename would fail
    val tmp = live.suffix("__merging")
    val backup = live.suffix("__premerge")
    // crash recovery: restore a state stranded at the backup name (or this
    // merge would silently bootstrap from empty and lose the history) and
    // clear stale transient siblings
    TableSwap.recover(fs, live, tmp, backup, "state merge")
    // data-file-aware: an empty pre-created directory is NOT state — read
    // it and the bootstrap would throw instead of starting fresh
    val exists = DedupAppend.exists(spark, live.toString)
    if (!exists && fs.exists(live) && !fs.delete(live, true))
      throw new java.io.IOException(
        s"state merge: could not clear empty pre-created dir $live")
    val stampedId = if (exists) lastMergedBatch(spark, path) else None
    if (batchId >= 0 && stampedId.exists(batchId <= _))
      return // replayed micro-batch: its partials are already in the state
    val existing =
      if (exists) spark.read.parquet(live.toString)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), partial.schema)
    val merged = combine(existing.unionByName(partial))

    merged.write.mode("overwrite").parquet(tmp.toString)
    // the marker travels INSIDE the new state dir, so stamp and data swap
    // in the same rename — no window where one exists without the other
    // (parquet readers skip underscore-prefixed files). A plain-batch merge
    // (batchId < 0, e.g. a backfill interleaved with a stream) CARRIES THE
    // EXISTING STAMP FORWARD — dropping it would reopen the double-count
    // window for the stream's next retry.
    val stamp = if (batchId >= 0) Some(batchId) else stampedId
    stamp.foreach { id =>
      val out = fs.create(new Path(tmp, MarkerName), true)
      try out.write(id.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    TableSwap.swapInto(fs, live, tmp, backup, exists, "state merge")
  }
}
