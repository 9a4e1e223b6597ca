package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew mitigation (DESIGN.md): when one key carries a disproportionate
  * share of rows, a single reducer becomes the stage's critical path.
  *
  * Two tools:
  *  - Aggregations: two-phase salted aggregation — shuffle on (key, salt)
  *    spreads the hot key over N reducers, then a second tiny shuffle on
  *    key merges the partials. Works for any algebraic aggregate.
  *  - Joins: Spark's AQE skew-join handles skewed SORT-MERGE joins
  *    automatically (spark.sql.adaptive.skewJoin.enabled, on by default);
  *    salting an equi join manually only pays when AQE can't see the skew
  *    (e.g. post-shuffle explosion), so it's deliberately not replicated
  *    here.
  *
  * Note Spark's hash aggregation already does map-side partial
  * aggregation, which absorbs most skew for low-cardinality groups; the
  * salted form matters when per-partition group cardinality is too high
  * for the partial hash map (spilling) or when using non-combinable
  * collect-style aggregates.
  */
object Salting {

  /** count+sum per key with an N-way salt. The merged result is exact
    * regardless of how the salt routes rows; deriving the salt from row
    * content + partition id (not monotonically_increasing_id, whose
    * row-index component reshuffles with every scan split change) keeps
    * the routing deterministic for a given input layout while still
    * spreading identical hot-key rows from different partitions across
    * reducers — uniform with the engine's wider determinism story. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .withColumn("salt",
        pmod(hash(col("key"), col("v"), spark_partition_id()), lit(saltBuckets)))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"),
           sum(col("v").cast(DecimalType(18, 2))).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n"),
           sum(col("ps")).cast(DoubleType).as("total"))
}
