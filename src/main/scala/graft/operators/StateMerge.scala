package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE maintained-table merge discipline shared by every
  * merge-by-re-aggregation state keeper (RollupState, the tumbling and
  * MV maintenance streams): read the table or bootstrap an empty frame
  * with the partial's schema, union the batch's partial in, re-combine,
  * MATERIALIZE (the output directory is also the input directory — a
  * lazy plan would read what it is overwriting), then overwrite.
  *
  * Scale note: localCheckpoint is the test-scale materialization; a
  * cluster deployment swaps in a temp-dir write + atomic rename (the
  * Maintenance.appendCycle swap) or a partition-level overwrite when the
  * state is partitioned at rest. Centralized here so that swap happens
  * in one place.
  */
object StateMerge {

  def mergeOverwrite(spark: SparkSession, partial: DataFrame, path: String)
                    (combine: DataFrame => DataFrame): Unit = {
    val existing =
      if (new java.io.File(path).exists) spark.read.parquet(path)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), partial.schema)
    val merged = combine(existing.unionByName(partial))
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(path)
  }
}
