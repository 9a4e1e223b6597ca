package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** K-minimum-values (KMV / bottom-k) sketches for distinct-set overlap.
  *
  * HLL (q11/q53) answers per-group distinct counts and unions, but two
  * HLLs cannot INTERSECT. The bottom-k sketch can: keep each group's k
  * smallest distinct hashes; for any two groups the k smallest of the
  * merged sketches are exactly the k smallest of the merged SETS, so the
  * sketch supports the three classic estimators (Beyer et al., "On
  * synopses for distinct-value estimation under multiset operations"):
  *
  *   distinct(A∪B) ≈ (k−1)·M / τ       (τ = k-th smallest of the union,
  *                                      hashes uniform on [0, M))
  *   J(A,B)        ≈ |common ≤ τ| / k
  *   |A∩B|         ≈ J · distinct(A∪B)
  *
  * Determinism: the hash is the engine's cross-engine h31 (oracle twin
  * `TextFns.h31Sql`), ranks carry a total order, and the estimators are
  * integer arithmetic plus single IEEE divides/multiplies — bit-identical
  * across engines and partitionings, unlike a sampled or rand() sketch.
  *
  * Scale shape: the per-group distinct is one map-side-combinable agg;
  * the bottom-k is a WindowGroupLimit (partial top-k per map partition →
  * ≤k rows per (group, partition) cross the wire); everything after the
  * sketch build touches only #groups·k rows. Groups with fewer than k
  * distinct members degrade gracefully: τ falls back to the largest
  * union hash and the denominator to the union size (the sketch IS the
  * set, so the Jaccard becomes exact; the union-cardinality term stays
  * an estimate of the hash spacing).
  */
object Kmv {

  /** Bottom-k sketch per group: the k smallest distinct h31 hashes of
    * `memberCol`, as (g, h, rn). */
  def sketch(df: DataFrame, groupCol: Column, memberCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    df.select(groupCol.as("g"),
        TextFns.h31(concat(lit("kmv:"), memberCol.cast(StringType))).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
  }

  /** All-pairs overlap estimates from the sketches: for every group pair
    * (ga < gb), the union threshold τ, the common-hash count at or below
    * it, and the three estimators. Input must be a [[sketch]] result;
    * every frame here is #groups·k rows or smaller. */
  def intersectEstimates(sk: DataFrame, k: Int): DataFrame = {
    val groups = sk.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb")) // #groups² rows: tiny by construction
    // union of each pair's sketches, distinct hashes, re-ranked. Two
    // hash-joinable equi legs unioned — the single OR-condition join
    // (sk.g = ga OR sk.g = gb) cannot be planned as an equi join and
    // degenerates to a nested loop over pairs × sketch rows
    val wu = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val un = pairs.join(sk, sk("g") === col("ga")).select(col("ga"), col("gb"), col("h"))
      .unionByName(
        pairs.join(sk, sk("g") === col("gb")).select(col("ga"), col("gb"), col("h")))
      .distinct()
      .withColumn("urn", row_number().over(wu).cast(LongType))
    val kEff = un.groupBy(col("ga"), col("gb"))
      .agg(least(lit(k.toLong), max(col("urn"))).as("k_eff"))
    val tau = un.join(kEff, Seq("ga", "gb"))
      .filter(col("urn") === col("k_eff"))
      .select(col("ga"), col("gb"), col("k_eff"), col("h").as("tau"))
    // hashes present in BOTH sketches, counted at or below τ
    val a = sk.select(col("g").as("ga"), col("h"))
    val b = sk.select(col("g").as("gb"), col("h"))
    val common = a.join(b, Seq("h")).filter(col("ga") < col("gb"))
      .join(tau, Seq("ga", "gb"))
      .filter(col("h") <= col("tau"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_common"))
    tau.join(common, Seq("ga", "gb"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("est_union",
        (col("k_eff") - 1).cast(DoubleType) * TextFns.P31
          / col("tau").cast(DoubleType))
      .withColumn("est_jaccard",
        col("n_common").cast(DoubleType) / col("k_eff").cast(DoubleType))
      .withColumn("est_intersect", col("est_jaccard") * col("est_union"))
      .select(col("ga"), col("gb"), col("k_eff"), col("tau"), col("n_common"),
        col("est_jaccard"), col("est_union"), col("est_intersect"))
  }
}
