package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.SnapshotStore

/** THE CHANGE FEED AS A PUBLIC STREAMING SOURCE — the Delta-CDF-style
  * surface over the snapshot table's commit log:
  *
  * {{{
  * spark.readStream.format("graft-snapshot")
  *   .option("readChangeFeed", "true")
  *   .option("startingVersion", 1)      // default 1
  *   .load(tableRoot)                   // table cols + _change_type + _commit_version
  * }}}
  *
  * OFFSETS ARE TABLE VERSIONS. The commit markers already form a total
  * order with exactly-once semantics (a version exists iff its
  * fail-if-exists marker does), so the streaming offset is simply the
  * highest committed version — no custom bookkeeping, and the
  * checkpointed offset range replays DETERMINISTICALLY: `getBatch(a, b]`
  * re-derives the identical rows from the immutable manifests, which is
  * what makes the source safely re-playable after any crash.
  *
  * EACH BATCH IS MANIFEST-DIFF-SIZED: version v's rows come from
  * [[SnapshotStore.changesBetween]](v-1, v) — only files present in
  * exactly one of the two manifests (or newly tombstoned) are opened, so
  * a consumer follows a 100 TB table paying churn-sized reads per
  * version, never a table re-scan. Version 1 (or `startingVersion` = 1)
  * delivers the initial snapshot as inserts.
  *
  * NON-CONTIGUOUS HISTORY REFUSES LOUDLY: markers commit in strict
  * order, so a gap in the requested range means vacuum aged a version
  * out from under the subscription — the consumer must re-bootstrap from
  * a current snapshot, never silently skip deltas (the law q153 scores
  * through this public API; the helper-level twin is
  * `EventStreams.snapshotCdcStream`, reference the q148 gate).
  *
  * This is the V1 `Source` seam (the same one Spark's own file source
  * and the public Delta connector use): `getBatch` hands back the change
  * rows as a streaming DataFrame over the batch plan's InternalRows. */
class SnapshotCdcSource(sqlContext: SQLContext, path: String,
                        startingVersion: Long) extends Source {
  private def spark: SparkSession = sqlContext.sparkSession

  private val tableSchema: StructType = SnapshotStore.schemaOf(spark, path)
  override val schema: StructType = SnapshotCdcSource.cdcSchema(tableSchema)

  private def toLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] = {
    val vs = SnapshotStore.versions(spark, path)
    if (vs.isEmpty || vs.last < startingVersion) None
    else Some(LongOffset(vs.last))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(toLong(_) + 1L).getOrElse(startingVersion)
    val toV = toLong(end)
    val cols = tableSchema.fieldNames.toSeq
    if (fromV > toV) // replayed empty range: a valid no-op batch
      return org.apache.spark.sql.classic.GraftLogicalPlanApi.streamingDataFrame(
        spark, spark.sparkContext
          .emptyRDD[org.apache.spark.sql.catalyst.InternalRow], schema)
    // contiguity law: every version in the range — AND the diff base
    // fromV-1 — must still be committed, or a delta was vacuumed away
    val have = SnapshotStore.versions(spark, path).toSet
    val need = (math.max(1L, fromV - 1L) to toV)
    val missing = need.filterNot(have)
    require(missing.isEmpty,
      s"graft-snapshot change feed at $path: version(s) ${missing.mkString(",")} " +
        "were vacuumed away under the subscription — the change history is " +
        "non-contiguous; re-bootstrap the consumer from a current snapshot")
    val parts = (fromV to toV).map { v =>
      val d =
        if (v == 1L) SnapshotStore.readVersion(spark, path, 1L)
          .withColumn("change_type", lit("insert"))
        else SnapshotStore.changesBetween(spark, path, v - 1L, v)
      d.select(cols.map(col) :+
        col("change_type").as("_change_type") :+
        lit(v).as("_commit_version"): _*)
    }
    val df = parts.reduce(_ unionByName _)
    org.apache.spark.sql.classic.GraftLogicalPlanApi.streamingDataFrame(
      spark, df.queryExecution.toRdd, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object SnapshotCdcSource {
  /** Table columns plus the Delta-CDF-shaped metadata pair. */
  def cdcSchema(table: StructType): StructType =
    StructType(table.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
}
