package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Extended, LlmData}

/** q66 triangle counting + x69 cluster keep-best: law tests against
  * driver-side references, plus the no-Cartesian plan guarantee the
  * degree-oriented wedge join exists to provide. */
class GraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Degree-oriented count must equal the brute count on arbitrary graphs:
    * all C(n,3) vertex triples with all three edges present. */
  private def bruteTriangles(edges: Set[(Long, Long)]): Long = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val has = (a: Long, b: Long) =>
      edges.contains((math.min(a, b), math.max(a, b)))
    vs.combinations(3).count { case Seq(x, y, z) =>
      has(x, y) && has(x, z) && has(y, z)
    }
  }

  private def countVia(edges: Set[(Long, Long)]): Long = {
    // run the same oriented-wedge pipeline q66 uses, on a raw edge list
    val e = edges.toSeq.toDF("a", "b")
    val deg = e.select(explode(array($"a", $"b")).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("dg"))
    val o = e
      .join(deg.select($"v".as("a"), $"dg".as("da")), "a")
      .join(deg.select($"v".as("b"), $"dg".as("db")), "b")
      .select(
        when(struct($"da", $"a") < struct($"db", $"b"),
          struct($"a".as("s"), $"b".as("t"), $"db".as("dt")))
          .otherwise(struct($"b".as("s"), $"a".as("t"), $"da".as("dt")))
          .as("e"))
      .select($"e.s".as("u"), $"e.t".as("v"), $"e.dt".as("dv"))
    val e1 = o.select($"u", $"v".as("v1"), $"dv".as("d1"))
    val e2 = o.select($"u", $"v".as("v2"), $"dv".as("d2"))
    e1.join(e2, "u")
      .filter(struct($"d1", $"v1") < struct($"d2", $"v2"))
      .join(o.select($"u".as("v1"), $"v".as("v2")), Seq("v1", "v2"))
      .count()
  }

  test("q66: oriented-wedge count equals brute triple enumeration on random graphs") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSet
      assert(countVia(edges) == bruteTriangles(edges), s"trial $trial: $edges")
    }
    // degenerate shapes: empty, one edge, a path (0 triangles), a clique
    assert(countVia(Set.empty[(Long, Long)]) == 0L)
    assert(countVia(Set((1L, 2L))) == 0L)
    assert(countVia(Set((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    val k5 = (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)).toSet
    assert(countVia(k5) == 10L)
  }

  test("q66 plan: two equi wedge joins, no Cartesian product") {
    val plan = Extended.q66Triangles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge join must stay equi-keyed:\n$plan")
    assert(Extended.q66Triangles(spark, sf).as[Long].head() > 0L)
  }

  test("q67: merge-form as-of equals q19's join-aggregate form row for row") {
    val a = Extended.q19AsofJoin(spark, sf).collect().toSeq
    val b = Extended.q67AsofMerge(spark, sf).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("q67 plan: no join — one union, per-user window, single hash exchange shape") {
    val plan = Extended.q67AsofMerge(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"merge form must not join:\n$plan")
    assert(plan.contains("Union"), s"expected the tagged union:\n$plan")
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx >= 1 && plan.contains("windowspecdefinition(user_id"),
      s"expected the per-user window over one user_id exchange:\n$plan")
  }

  test("x69: every keep_id is its cluster's argmax by (score, doc_id asc)") {
    val got = LlmData.x69ClusterKeep(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // reference: clusters joined with scores, reduced driver-side
    val d = Tables.t(spark, sf, "documents").filter(pmod($"doc_id", lit(2)) === 0)
    val members = graft.operators.TextDedup
      .nearDupClusters(d, LlmData.JaccThreshold)
      .join(graft.operators.Curation.qualityScore(d)
        .select($"doc_id", $"score"), "doc_id")
      .select($"cluster_id", $"doc_id", $"score")
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1)
    val want = members.map { case (cid, ms) =>
      val keep = ms.maxBy { case (_, id, s) => (s, -id) }._2
      (cid, keep, ms.size.toLong, ms.size.toLong - 1)
    }.toSeq.sortBy(_._1)
    assert(got == want)
    // clusters have >= 2 members by construction (singletons have no pairs)
    assert(got.forall(_._3 >= 2))
  }
}
