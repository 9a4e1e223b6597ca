package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Latest-wins keyed state maintenance — the CDC-upsert counterpart of
  * [[DedupAppend]] (which is insert-only): a state table holds exactly one
  * row per key, and merging a change batch keeps, per key, the row with the
  * highest version. Delete tombstones stay IN the state (so a replayed
  * older upsert can never resurrect a deleted key); readers filter them via
  * [[current]].
  *
  * The algebra is what makes the streaming form exact: `max_by(payload,
  * version)` is a commutative, idempotent monoid, so folding change batches
  * in ANY order — or re-delivering any of them — yields the same state as
  * one batch compaction over the full log (law-tested in
  * StreamingIngestSpec). Per batch it is one map-side-combinable agg on the
  * key: hot keys collapse before the exchange.
  *
  * Scale note: the state table is KEY-cardinality-sized, not log-sized. At
  * 100 TB the overwrite below becomes a partition-level swap (hash-bucket
  * the state by key, rewrite only buckets the batch touches); the merge
  * algebra is unchanged.
  */
object UpsertState {

  /** One row per key: the payload of the highest-version change. The
    * ordering key is the caller's `version` columns EXTENDED by the
    * remaining orderable payload columns (sorted by name): if two changes
    * for one key tie on version with different payloads, `max_by` alone
    * would keep whichever the aggregation met last — fold-order-dependent,
    * breaking the idempotent-monoid law every streaming caller relies on.
    * With the content extension, version ties break deterministically by
    * payload; rows still tied are identical, where any survivor is the
    * same row. Unorderable payload types (maps) are skipped. */
  def compact(changes: DataFrame, keys: Seq[String], version: Seq[String]): DataFrame = {
    val payload = changes.columns.filterNot(keys.contains).toSeq
    val contentTie = changes.schema.fields
      .filter(f => !keys.contains(f.name) && !version.contains(f.name) &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(_.name).sorted.toSeq
    changes.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct((version ++ contentTie).map(col): _*)).as("last"))
      .select(keys.map(col) ++ payload.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Merge one change batch into the state table at `statePath`
    * (creating it on first use). Idempotent under batch re-delivery, so
    * the plain-batch [[StateMerge]] form (no replay stamp) is exact even
    * under foreachBatch retry — latest-wins is a commutative idempotent
    * monoid, unlike the sum algebras that need the stamp. Delegating also
    * buys the crash-safe swap (never an in-place overwrite of the
    * directory being read) and the FileSystem-API existence probe (a
    * `java.io.File` probe is local-FS-only and would silently bootstrap
    * from empty on HDFS/S3). */
  def merge(spark: SparkSession, batch: DataFrame, statePath: String,
            keys: Seq[String], version: Seq[String]): Unit =
    StateMerge.mergeOverwrite(spark, batch, statePath)(
      df => compact(df, keys, version))

  /** The live view: state minus delete tombstones. */
  def current(state: DataFrame, opCol: String, deleteOp: String): DataFrame =
    state.filter(col(opCol) =!= deleteOp)

  /** The 100 TB form of [[merge]]: state lives hash-bucketed by key
    * (`bucket=` directory partitions) and a batch rewrites ONLY the
    * buckets its keys touch — via dynamic partition overwrite, Spark's
    * native partition-swap. Everything else is unchanged algebra, so
    * mergeBucketed ≡ merge row-for-row (law-tested in ChangeDataSpec,
    * which also asserts untouched bucket files are physically left
    * alone).
    *
    * The touched-bucket id list is collected to the driver — bounded by
    * `nBuckets`, never by data. Bucket count trades rewrite granularity
    * against small files; at 100 TB pick buckets ~ state size / 1 GiB. */
  def mergeBucketed(spark: SparkSession, batch: DataFrame, statePath: String,
                    keys: Seq[String], version: Seq[String],
                    nBuckets: Int = 64, owner: Option[String] = None): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // single-writer ENFORCED (Lease, the StateMerge discipline): two
    // concurrent bucketed merges would race the read-modify-write of any
    // shared touched bucket — the second maintainer fails cleanly. The
    // `owner` token (a streaming maintainer's checkpoint location, the
    // same contract as DedupAppend.append and StateMerge.mergeOverwrite)
    // lets a crashed lineage's restart re-acquire its own stale lease and
    // self-heal — the merge is idempotent under re-delivery, so take-over
    // cannot double-apply; an anonymous maintainer that dies still needs
    // the explicit Lease.break_.
    val live = new org.apache.hadoop.fs.Path(statePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Lease.withLease(fs, live, "bucketed upsert", owner) {
      mergeBucketedUnleased(spark, batch, statePath, keys, version, nBuckets)
    }
  }

  private def mergeBucketedUnleased(spark: SparkSession, batch: DataFrame,
                                    statePath: String, keys: Seq[String],
                                    version: Seq[String], nBuckets: Int): Unit = {
    val withBucket = batch.withColumn("bucket",
      pmod(hash(keys.map(col): _*), lit(nBuckets)))
    val touched = withBucket.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val existingTouched =
      // data-file-aware probe (an empty pre-created dir must bootstrap,
      // not throw on schema inference); FileSystem-API, so HDFS/S3 state
      // is recognized — a java.io.File probe would always say "absent"
      if (DedupAppend.exists(spark, statePath))
        spark.read.parquet(statePath)
          .filter(col("bucket").isin(touched: _*)) // prunes to touched dirs
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withBucket.schema)
    val merged = compact(existingTouched.unionByName(withBucket),
        keys :+ "bucket", version)
      .localCheckpoint(true) // materialize before overwriting dirs being read
    graft.util.Confs.withConfs(spark,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      merged.write.mode("overwrite").partitionBy("bucket").parquet(statePath)
    }
  }
}
