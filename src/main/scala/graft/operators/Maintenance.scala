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
  * Protocol (single-writer, ENFORCED by [[Lease]] — a second concurrent
  * maintainer fails cleanly at acquire rather than interleaving):
  * append the batch idempotently; if the table now exceeds `maxFiles` data
  * files, rewrite it to ~`targetFileBytes` files in a sibling directory and
  * swap directories. The swap is a checked backup-rename dance (live→backup,
  * tmp→live, drop backup) so the table survives a crash at any point under
  * exactly one of its sibling names; in a catalog-backed table format the
  * same step is an atomic pointer flip, which is what makes the rewrite safe
  * under concurrent readers — documented, not simulated.
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
    val live = new Path(path)
    // siblings derive from the normalized Path (trailing-slash-safe; string
    // concat would nest them inside the live dir)
    val tmp = live.suffix("__compacting")
    val backup = live.suffix("__precompact")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-writer ENFORCED across the whole cycle (Lease): two
    // interleaved cycles could double-insert keys or cross their swap
    // dances — the second maintainer fails cleanly before touching disk
    Lease.withLease(fs, live, "append cycle") {
      // crash recovery: restore a table stranded at the backup name (or this
      // append would re-create the table from one batch and silently orphan
      // the history) and clear stale transient siblings — a half-written
      // __compacting from a crash mid-rewrite would otherwise sit next to a
      // table that never again crosses maxFiles, forever
      TableSwap.recover(fs, live, tmp, backup, "compaction")
      DedupAppend.appendUnleased(spark, batch, path, keys, tieBreak)
      if (Compaction.dataFileCount(spark, path) > maxFiles) {
        Compaction.compact(spark, path, tmp.toString, targetFileBytes)
        // checked backup-rename swap (shared TableSwap dance): the table is
        // recoverable at every step; in a catalog-backed table format this
        // is one atomic pointer flip; plain-parquet single-writer documented
        TableSwap.swapInto(fs, live, tmp, backup, liveExists = true, "compaction")
      }
      Compaction.dataFileCount(spark, path)
    }
  }

  /** Snapshot reconciliation: row-level diff of two keyed table states —
    * the anti-entropy check a maintained table (DedupAppend / UpsertState
    * output, a replica, a migration target) runs against its source of
    * truth. Each key is classified `added` (in B only), `removed` (in A
    * only), `changed` (payload differs; null-safe compare), or
    * `unchanged`. Returns the joined frame with `status`, the key
    * columns, and both sides' payload columns as `a_*`/`b_*`.
    *
    * Scale shape: ONE full-outer sort-merge join co-partitioned on the
    * key — each side shuffles once, no window, no driver state; presence
    * is tracked by constant marker columns (a null payload is a value,
    * not absence). For wide payloads, pre-hash each side's payload to a
    * fixed-width digest and diff on that (same plan, narrower exchange) —
    * here the payload columns are compared directly so the output can
    * carry both sides for repair. */
  def snapshotDiff(a: DataFrame, b: DataFrame,
                   keys: Seq[String], payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty && payload.nonEmpty, "keys and payload must be non-empty")
    val an = payload.foldLeft(a.select((keys ++ payload).map(col): _*))(
      (d, c) => d.withColumnRenamed(c, s"a_$c")).withColumn("a_present", lit(true))
    val bn = payload.foldLeft(b.select((keys ++ payload).map(col): _*))(
      (d, c) => d.withColumnRenamed(c, s"b_$c")).withColumn("b_present", lit(true))
    val same = payload.map(c => col(s"a_$c") <=> col(s"b_$c")).reduce(_ && _)
    an.join(bn, keys, "full_outer")
      .withColumn("status",
        when(col("a_present").isNull, "added")
          .when(col("b_present").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("a_present", "b_present")
  }
}
