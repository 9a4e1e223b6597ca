package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Kmv, Maintenance, Ranks}

class RanksSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- Ranks.globalRank -------------------------------------------------

  test("globalRank equals the single-window row_number under any input partitioning") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => ((i * 37) % 211, i.toLong)).toDF("v", "id")
    for (parts <- Seq(1, 7)) {
      val got = Ranks.globalRank(df.repartition(parts), Seq($"v", $"id"))
        .select($"id", $"grank").as[(Long, Long)].collect().toMap
      val want = df.withColumn("grank",
          row_number().over(Window.orderBy($"v", $"id")).cast("long"))
        .select($"id", $"grank").as[(Long, Long)].collect().toMap
      assert(got == want)
    }
  }

  // ---- Ranks.equiDepth --------------------------------------------------

  test("equiDepth: bucket sizes differ by at most one, cover all rows, boundaries ordered") {
    val df = (1 to 1003).map(i => (((i * 61) % 997).toDouble, i.toLong)).toDF("v", "id")
    val got = Ranks.equiDepth(df, $"v", $"id", 16)
      .select($"bucket", $"n_rows", $"min_v", $"max_v")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (0L until 16L))
    assert(got.map(_._2).sum == 1003L)
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    // depth boundaries are non-decreasing across buckets
    got.sliding(2).foreach { case Seq(a, b) => assert(a._4 <= b._3) case _ => }
  }

  // ---- Maintenance.snapshotDiff ----------------------------------------

  test("snapshotDiff: all four statuses, null payload is a value not absence") {
    val a = Seq((1L, Option(10L)), (2L, Option(20L)), (3L, None), (4L, Option(40L)))
      .toDF("k", "p")
    val b = Seq((1L, Option(10L)), (2L, Option(21L)), (3L, None), (5L, Option(50L)))
      .toDF("k", "p")
    val got = Maintenance.snapshotDiff(a, b, Seq("k"), Seq("p"))
      .select($"k", $"status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null <=> null: same value on both sides
      4L -> "removed", 5L -> "added"))
    // a present row whose payload BECOMES null is a change, not a removal
    val c = Maintenance.snapshotDiff(
        Seq((9L, Option(1L))).toDF("k", "p"),
        Seq((9L, Option.empty[Long])).toDF("k", "p"), Seq("k"), Seq("p"))
      .select($"status").as[String].collect().toSeq
    assert(c == Seq("changed"))
  }

  // ---- Kmv --------------------------------------------------------------

  test("kmv sketch: at most k rows per group, the k smallest distinct hashes") {
    val df = (1 to 300).map(i => (s"g${i % 3}", (i % 97).toLong)).toDF("g", "m")
    val sk = Kmv.sketch(df, $"g", $"m", 10).collect()
    val byG = sk.groupBy(_.getAs[String]("g"))
    assert(byG.keySet == Set("g0", "g1", "g2"))
    byG.values.foreach { rows =>
      assert(rows.length == 10)
      val hs = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("h"))
      assert(hs.sorted.toSeq == hs.toSeq && hs.distinct.length == hs.length)
    }
  }

  test("kmv estimates: degenerate regime (sets smaller than k) gives exact Jaccard") {
    // g0 members 1..8, g1 members 5..12 → |∩|=4, |∪|=12, J=1/3
    val rows = (1 to 8).map(m => ("g0", m.toLong)) ++ (5 to 12).map(m => ("g1", m.toLong))
    val sk = Kmv.sketch(rows.toDF("g", "m"), $"g", $"m", 32)
    val est = Kmv.intersectEstimates(sk, 32)
      .select($"k_eff", $"n_common", $"est_jaccard").as[(Long, Long, Double)]
      .collect().toSeq
    assert(est == Seq((12L, 4L, 4.0 / 12.0)))
  }

  test("kmv merge law: sketch of a union = bottom-k of merged sketches") {
    // the property that makes the sketch a maintainable/mergeable state:
    // sketches from disjoint data slices fold to the whole-data sketch
    val all = (1 to 400).map(i => ("g", ((i * 131) % 359).toLong)).toDF("g", "m")
    val s1 = Kmv.sketch(all.filter($"m" % 2 === 0), $"g", $"m", 16)
    val s2 = Kmv.sketch(all.filter($"m" % 2 =!= 0), $"g", $"m", 16)
    import org.apache.spark.sql.expressions.Window
    val merged = s1.select($"g", $"h").union(s2.select($"g", $"h")).distinct()
      .withColumn("rn", row_number().over(Window.partitionBy($"g").orderBy($"h")).cast("long"))
      .filter($"rn" <= 16)
    val whole = Kmv.sketch(all, $"g", $"m", 16)
    assert(merged.select($"g", $"h", $"rn").as[(String, Long, Long)].collect().toSet ==
      whole.select($"g", $"h", $"rn").as[(String, Long, Long)].collect().toSet)
  }

  test("kmv estimates: truncating regime tracks the exact overlap within sketch error") {
    val df = Tables.t(spark, "/root/testdata/sf0.01", "events")
      .select($"event_type".as("g"), $"user_id".as("m"))
    val est = Kmv.intersectEstimates(Kmv.sketch(df, $"g", $"m", 32), 32)
      .select($"ga", $"gb", $"est_intersect").as[(String, String, Double)]
      .collect().map { case (a, b, e) => (a, b) -> e }.toMap
    val exact = df.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).toSet }
    est.foreach { case ((a, b), e) =>
      val x = exact(a).intersect(exact(b)).size.toDouble
      // bottom-k at k=32: generous 3σ-ish band — this is an estimator law,
      // not a determinism law (determinism is the oracle hash's job)
      assert(math.abs(e - x) <= math.max(25.0, x), s"($a,$b): est $e vs exact $x")
    }
  }
}
