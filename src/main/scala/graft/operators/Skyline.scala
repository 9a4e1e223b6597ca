package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier / maximal vectors): the rows not dominated
  * on a pair of columns, both maximized. `q` dominates `p` iff
  * `q.x >= p.x && q.y >= p.y` and at least one inequality is strict; equal
  * points do NOT dominate each other, so exact duplicates of a frontier
  * point all survive.
  *
  * The textbook formulation is a quadratic self-anti-join
  * (`NOT EXISTS (… dominating q …)`) — that form is kept as the DuckDB
  * oracle and as the spec's reference implementation, but it is O(n²) and
  * un-runnable at scale. The engine form is the sort-based linear scan:
  * after grouping to one `max(y)` per distinct `x`, a point lies on the
  * frontier iff its `y` strictly exceeds the running maximum of `y` over
  * all STRICTLY LARGER `x` (and, within its own `x` group, iff it attains
  * the group max).
  *
  * Scale shape — the running max is hierarchical, never a global window:
  * a `Window.orderBy(x desc)` with no partition key would serialize the
  * whole distinct-`x` frame into ONE task. Instead the grouped frame is
  * range-partitioned on `x` desc (a parallel external sort; every range a
  * bounded task), each range computes its local prefix max, per-range maxima
  * (one tiny row per range) cumulate into per-range offsets, and
  * `greatest(local prefix, offset)` is the exact global prefix max for ANY
  * range boundaries — so the answer is partitioning-independent while the
  * largest task is one range partition. The final membership join back to
  * the input is an equi join on `x` (AQE broadcasts the frontier side when
  * small). Total cost: one hash agg + one range exchange over the
  * DISTINCT-x frame + one equi join — vs the oracle's n² comparisons.
  */
object Skyline {

  /** All input rows (original columns preserved) on the maximize-(x, y)
    * skyline. Both columns must be orderable; nulls must be absent (a null
    * coordinate has no dominance semantics). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    // one row per distinct x: the best y it carries (map-side combinable)
    val best = df.groupBy(x).agg(max(col(yCol)).as("x_ymax"))
    // hierarchical strict-prefix max of x_ymax over x desc. Distinct x
    // values never tie, so every earlier row in the range order has
    // strictly larger x — the "rows before me" frame IS the strict frame.
    val ranged = best
      .repartitionByRange(x.desc)
      .withColumn("rng", spark_partition_id())
      // PIN the partition labels (q68/Ranks discipline): the frame feeds
      // both the offsets aggregate and the join, and an independently
      // re-executed range exchange may be AQE-coalesced to a different
      // partition count or re-sampled to different bounds — silently
      // corrupting or dropping ranges. Distinct-x-sized, so cheap to pin.
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("rng")).orderBy(x.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("local_pm", max(col("x_ymax")).over(wLocal))
    // per-range maxima: |ranges| rows — the cumulative pass is trivial
    val wOff = Window.orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("rng"))
      .agg(max(col("x_ymax")).as("range_max"))
      .withColumn("prev_max", max(col("range_max")).over(wOff))
      .select(col("rng"), col("prev_max"))
    val frontier = local.join(broadcast(offsets), Seq("rng"))
      .withColumn("pm", greatest(coalesce(col("local_pm"), col("prev_max")),
                                 coalesce(col("prev_max"), col("local_pm"))))
      // on the frontier iff nothing with larger x reaches this y
      .filter(col("pm").isNull || col("pm") < col("x_ymax"))
      .select(x.as("sk_x"), col("x_ymax").as("sk_y"))
    // membership: survivors are rows attaining their x group's max y, for
    // frontier x values only (renamed keys — no ambiguous self-join lineage)
    df.join(frontier,
        col(xCol) === col("sk_x") && col(yCol) === col("sk_y"))
      .select(df.columns.map(col): _*)
  }
}
