package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

import graft.operators.SnapshotStore

/** THE SNAPSHOT TABLE AS A PUBLIC STREAMING SINK:
  *
  * {{{
  * df.writeStream.format("graft-snapshot")
  *   .option("checkpointLocation", ckpt)
  *   .option("dedupKeys", "doc_id")          // optional: keyed idempotent
  *   .option("statsColumns", "doc_id")       // creation options, first batch
  *   .start(tableRoot)
  * }}}
  *
  * Every micro-batch lands as ONE atomic versioned commit (the q134
  * contract, now behind the public format string): the first batch
  * creates the table (creation options honored), later batches append —
  * keyed-idempotent when `dedupKeys` is set.
  *
  * EXACTLY-ONCE is two independent layers:
  *
  *   1. A PER-LINEAGE TRANSACTION MARK: each commit carries a txn row
  *      (lineage id = the query's checkpoint location, batch id = the
  *      micro-batch id) in the SAME atomic segment as the batch's files
  *      — so a crash in the window between the table commit and the
  *      streaming engine's own offset commit replays the batch into a
  *      loud no-op ([[SnapshotStore.lastTxn]]); this is the
  *      SetTransaction discipline every table format's sink uses, and it
  *      needs no key columns.
  *   2. CONTENT idempotence via `dedupKeys`: a FULL redelivery from a
  *      FRESH checkpoint (a different lineage — the txn mark cannot help)
  *      anti-joins to nothing and is a version-level no-op.
  *
  * Append output mode only — a snapshot table is an append-commit log;
  * complete/update modes would re-state aggregates the table model does
  * not hold (loud refusal at sink creation, in the provider). */
class SnapshotSink(sqlContext: SQLContext, path: String,
                   dedupKeys: Seq[String], statsColumns: Seq[String],
                   clusterBy: Seq[String], numFiles: Int,
                   lineageId: String) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    // re-wrap the incrementally-planned rows as a batch frame
    val batch = org.apache.spark.sql.classic.GraftLogicalPlanApi.batchDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    val txn = Some((lineageId, batchId))
    val owner = Some(lineageId)
    if (SnapshotStore.versions(spark, path).isEmpty)
      // first batch creates the table — the txn mark commits in the
      // SAME atomic segment, so a replayed batch 0 against the
      // now-existing table no-ops on the append path below
      SnapshotStore.create(spark, batch, path, statsColumns = statsColumns,
        clusterBy = clusterBy, numFiles = numFiles, owner = owner,
        txn = txn): Unit
    else if (dedupKeys.nonEmpty)
      SnapshotStore.appendDedup(spark, batch, path, dedupKeys, Nil,
        owner = owner, txn = txn): Unit
    else
      SnapshotStore.append(spark, batch, path, txn = txn): Unit
  }

  override def toString: String = s"SnapshotSink[$path]"
}
