package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hierarchical global ranking and the statistics built on it.
  *
  * A global `row_number() OVER (ORDER BY …)` serializes the whole table
  * into ONE task's sort — the classic scale cliff. The pattern here (the
  * same one `Curation.globalSizeRank` and the x39/x58 packers use, made
  * generic): range-exchange on the sort key, per-range LOCAL row numbers,
  * then per-range COUNTS (a #ranges-sized frame) cumulated into broadcast
  * offsets — every task sorts only its range, and nothing larger than
  * #ranges rows crosses a non-range exchange.
  */
object Ranks {

  /** Dense 1-based global rank of every row in `sortCols` order, emitted
    * as column `grank` alongside the input columns. `sortCols` must be a
    * total order (include a unique tiebreak) or the rank is
    * partition-dependent. */
  def globalRank(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("rng", spark_partition_id())
    val wLocal = Window.partitionBy(col("rng")).orderBy(sortCols: _*)
    // MATERIALIZED once (eager localCheckpoint): `local` feeds both the
    // join's probe side and the offsets derivation. Without pinning, the
    // two subplans can execute the range exchange INDEPENDENTLY (exchange
    // reuse is best-effort once AQE re-optimizes stages), and AQE may
    // coalesce the two executions to different partition counts — the
    // offsets side then covers fewer `rng` ids than the probe side and
    // the inner join silently DROPS every row in the uncovered ranges
    // (observed: a 32-vs-7 coalesce losing 78% of rows when globalRank
    // was composed over another globalRank's output). Even without
    // coalescing, the range sampler may draw different bounds per
    // execution, mis-assigning ranks. Freezing the computed partitioning
    // is the only spelling that keeps `rng` consistent for both readers.
    val local = ranged.withColumn("local_rn", row_number().over(wLocal).cast(LongType))
      .localCheckpoint(true)
    // #ranges rows: the unkeyed window is bounded by construction
    val wOff = Window.orderBy(col("rng")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("rng")).agg(count(lit(1)).as("range_n"))
      .withColumn("offset", coalesce(sum(col("range_n")).over(wOff), lit(0L)))
      .select(col("rng"), col("offset"))
    local.join(broadcast(offsets), Seq("rng"))
      .withColumn("grank", col("offset") + col("local_rn"))
      .drop("rng", "local_rn", "offset")
  }

  /** Exact equi-DEPTH histogram: rows ranked by (`valueCol`, tiebreak)
    * and dealt into `buckets` groups of near-equal COUNT (sizes differ by
    * at most one; bucket of rank r is ((r−1)·B) div N). The complement of
    * the equi-width histogram (q33) and the exact form of what
    * approx-percentile sketches estimate — boundary values are true order
    * statistics, so this is also how exact quantile BOUNDARIES are
    * derived at scale.
    *
    * Returns (bucket, n_rows, min_v, max_v). Scale shape: the
    * hierarchical rank (one range exchange, per-range sorts) plus one
    * map-side-combinable agg on the bucket id; N arrives as a single-row
    * broadcast. */
  def equiDepth(df: DataFrame, valueCol: Column, tiebreak: Column,
                buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val base = df.select(valueCol.as("v"), tiebreak.as("tb"))
    val ranked = globalRank(base, Seq(col("v"), col("tb")))
    // count the cheap pre-rank input, not the ranked lineage
    val total = base.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"((grank - 1) * $buckets) div n_total"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }
}
