package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline
import graft.queries.Extended

class SkylineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Quadratic reference: the oracle's NOT-EXISTS dominance probe, spelled
    * as a cross join — independent of the engine's sort-based form. */
  private def bruteSkyline(df: DataFrame): Set[(Long, Long, Long)] = {
    val rows = df.as[(Long, Long, Long)].collect().toSeq
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet
  }

  private def mk(rows: (Long, Long, Long)*) = rows.toDF("id", "x", "y")

  test("skyline2D equals the quadratic dominance reference on a seeded random cloud") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = mk(pts: _*).repartition(5)
    val got = Skyline.skyline2D(df, "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSkyline(mk(pts: _*)))
  }

  test("ties: equal points do not dominate each other — duplicates of a frontier point all survive") {
    val df = mk(
      (1L, 10L, 10L), (2L, 10L, 10L), // duplicates, dominated by (4)/(6)
      (3L, 10L, 5L),                  // same x, lower y → dominated
      (4L, 12L, 10L), (6L, 12L, 10L), // duplicate FRONTIER point — both live
      (5L, 5L, 20L))
    val got = Skyline.skyline2D(df, "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    // (4)/(6) have x=12 > 10, y=10 >= 10 → kill 1,2,3; nothing kills them
    assert(got == Set((4L, 12L, 10L), (6L, 12L, 10L), (5L, 5L, 20L)))
  }

  test("a single row and a fully-dominated chain reduce correctly") {
    assert(Skyline.skyline2D(mk((1L, 3L, 3L)), "x", "y")
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 3L, 3L)))
    val chain = mk((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L))
    assert(Skyline.skyline2D(chain, "x", "y")
      .as[(Long, Long, Long)].collect().toSeq == Seq((3L, 3L, 3L)))
  }

  test("answer is partitioning-independent") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val a = Skyline.skyline2D(mk(pts: _*).repartition(1), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val b = Skyline.skyline2D(mk(pts: _*).repartition(7), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("plan: prefix max is hierarchical — range exchange, every x-desc window keyed by rng") {
    val plan = Extended.q65Skyline(spark, sf)
      .queryExecution.executedPlan.toString
    // the range exchange on x desc now executes inside the PINNED stage
    // (Skyline pins the ranged frame so both its consumers see one set of
    // partition labels — see the localCheckpoint comment at the site), so
    // the visible plan starts from the materialized partitions; the law
    // here is that no corpus-sized UNKEYED window survives downstream.
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the pinned ranged stage:\n$plan")
    // the corpus-sized prefix-max window must be keyed by the range id; a
    // global orderBy(x desc) window would serialize the frame into one task.
    // (The offsets window over per-range maxima is |ranges| rows — exempt.)
    val windows = "windowspecdefinition\\([^)]*\\)".r.findAllIn(plan).toList
    val prefixW = windows.filter(w => w.contains("p_retailprice") && w.contains("DESC"))
    assert(prefixW.nonEmpty, s"expected the local prefix-max window:\n$plan")
    assert(prefixW.forall(_.contains("rng")),
      s"prefix-max window must be keyed by rng:\n$prefixW")
  }

  test("q65 on testdata: every returned part is undominated, every omitted part is dominated") {
    val parts = Tables.t(spark, sf, "part")
      .select($"p_partkey", $"p_retailprice", ($"p_size" * 1L).as("p_size"))
    val all = parts.as[(Long, Double, Long)].collect().toSeq
    val got = Extended.q65Skyline(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    val expected = all.filter { case (_, x, y) =>
      !all.exists { case (_, qx, qy) => qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(_._1).sorted
    assert(got.map(_._1) == expected)
  }
}
