package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsofJoin

/** The custom layer-(c) as-of operator: logical node → injected strategy →
  * physical merge exec. Laws: equality with the declarative merge form
  * (EventStreams.asofEnrich, itself hash-gated against q19's oracle via
  * q67), random-fixture equality with a driver-side reference, and the
  * plan shape (the exec present, children exchanged + sorted by Catalyst,
  * no Union/Window/shuffle-join anywhere). */
class AsofExecSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def eventsDf = Tables.t(spark, sf, "events")
    .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id")
  private def ordersDf = Tables.t(spark, sf, "orders")
    .selectExpr("o_custkey as user_id",
      "unix_micros(cast(o_orderdate as timestamp)) as ts_us", "o_orderkey")

  test("exec equals the declarative merge form on testdata") {
    val got = AsofJoin.asof(eventsDf, ordersDf)
      .select($"event_id", $"user_id", $"o_orderkey", $"ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.streaming.EventStreams.asofEnrich(eventsDf, ordersDf)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("asof_orderkey"))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("exec equals a driver-side reference on random keyed streams") {
    val rnd = new scala.util.Random(17)
    val lefts = (1L to 300L).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i))
    val rights = (1L to 200L).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, 1000L + i))
    val got = AsofJoin.asof(
        lefts.toDF("k", "t", "lid").repartition(5),
        rights.toDF("k", "t", "rid").repartition(3))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    val want = lefts.flatMap { case (k, t, lid) =>
      val c = rights.filter(r => r._1 == k && r._2 <= t)
      if (c.isEmpty) None
      else Some((lid, c.maxBy(r => (r._2, r._3))._3))
    }.toSet
    assert(got == want && want.nonEmpty)
  }

  test("empty and no-match sides produce empty results, not failures") {
    val e = Seq.empty[(Long, Long, Long)].toDF("k", "t", "lid")
    val l = Seq((1L, 5L, 10L)).toDF("k", "t", "lid")
    val r = Seq((1L, 9L, 99L)).toDF("k", "t", "rid") // only AFTER the left time
    assert(AsofJoin.asof(e, r.toDF("k", "t", "rid")).count() == 0)
    assert(AsofJoin.asof(l, r).count() == 0)
    val rOk = Seq((1L, 5L, 99L)).toDF("k", "t", "rid") // equal time: inclusive
    assert(AsofJoin.asof(l, rOk).collect().map(_.getLong(3)).toSeq == Seq(99L))
  }

  test("AQE + skewed input: coalesced shuffles stay co-partitioned across the exec") {
    // The zipPartitions watch item: the exec's two children are separate
    // shuffles, and AQE's CoalesceShufflePartitions must coalesce them
    // IDENTICALLY or zipPartitions sees unequal partition counts. Force the
    // hostile shape: AQE on, aggressive coalescing (large advisory target
    // collapses the tiny side to one partition), one hot key carrying ~90%
    // of both sides so the sides' partition-size profiles diverge wildly.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val rnd = new scala.util.Random(43)
      val lefts = (1L to 4000L).map { i =>
        val k = if (i % 10 != 0) 7L else rnd.nextInt(40).toLong // 90% on key 7
        (k, rnd.nextInt(500).toLong, i)
      }
      val rights = (1L to 3000L).map { i =>
        val k = if (i % 10 != 0) 7L else rnd.nextInt(40).toLong
        (k, rnd.nextInt(500).toLong, 10000L + i)
      }
      val got = AsofJoin.asof(
          lefts.toDF("k", "t", "lid").repartition(16),
          rights.toDF("k", "t", "rid").repartition(11))
        .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
      val want = lefts.flatMap { case (k, t, lid) =>
        val c = rights.filter(r => r._1 == k && r._2 <= t)
        if (c.isEmpty) None else Some((lid, c.maxBy(r => (r._2, r._3))._3))
      }.toSet
      assert(got == want && want.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("null keys/times are excluded, not merged as key 0 / epoch") {
    val l = Seq((Some(1L), Some(5L), 10L), (None, Some(5L), 11L),
      (Some(0L), Some(5L), 12L)).toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(3L), 99L), (Some(0L), Some(3L), 98L),
      (None, Some(3L), 97L), (Some(0L), None, 96L)).toDF("k", "t", "rid")
    val got = AsofJoin.asof(l, r).collect()
      .map(x => (x.getLong(2), x.getLong(3))).toSet
    // lid 11 (null key) matches nothing; rid 97/96 (null key/time) match
    // nothing; key 0 is a REAL key and matches normally
    assert(got == Set((10L, 99L), (12L, 98L)))
  }

  test("self as-of: both sides derived from one DataFrame bind unambiguously") {
    val base = Seq((1L, 5L, 100L), (1L, 3L, 50L), (2L, 4L, 70L))
      .toDF("k", "t", "v")
    val got = AsofJoin.asof(base, base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // each row matches itself (time <= itself, latest); schema keeps names
    assert(AsofJoin.asof(base, base).columns.toSeq == Seq("k", "t", "v", "v"))
    assert(got == Set((1L, 5L, 100L, 100L), (1L, 3L, 50L, 50L), (2L, 4L, 70L, 70L)))
  }

  test("outer exec equals a driver-side left-join reference on random keyed streams") {
    val rnd = new scala.util.Random(29)
    val lefts = (1L to 300L).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i))
    val rights = (1L to 120L).map(i => // sparse: many lefts unmatched
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, 1000L + i))
    val got = AsofJoin.asofOuter(
        lefts.toDF("k", "t", "lid").repartition(5),
        rights.toDF("k", "t", "rid").repartition(3))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val want = lefts.map { case (k, t, lid) =>
      val c = rights.filter(r => r._1 == k && r._2 <= t)
      (lid, if (c.isEmpty) None else Some(c.maxBy(r => (r._2, r._3))._3))
    }.toSet
    assert(got == want && want.exists(_._2.isEmpty) && want.exists(_._2.nonEmpty))
  }

  test("outer ≡ inner on matches; unmatched lefts carry null payload") {
    val inner = AsofJoin.asof(eventsDf, ordersDf)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    val outer = AsofJoin.asofOuter(eventsDf, ordersDf).collect()
    val matched = outer.filter(!_.isNullAt(3))
      .map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(matched == inner)
    assert(outer.length.toLong == eventsDf.count(), "every left row survives outer")
  }

  test("scored q69 (exec spelling) equals q19 (join-aggregate spelling) row for row") {
    val got = graft.queries.Extended.q69AsofExec(spark, sf).collect().toSeq
    val want = graft.queries.Extended.q19AsofJoin(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
    assert(graft.queries.Extended.q69AsofExec(spark, sf).columns.toSeq ==
      Seq("event_id", "user_id", "asof_orderkey", "asof_orderdate"))
  }

  test("q81 tolerance: within-window events equal q19; beyond-window events are null") {
    import org.apache.spark.sql.functions.{col, expr}
    val tol = graft.queries.Extended.q81AsofTolerance(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_orderkey")).map(_.toLong)).toMap
    val unb = graft.queries.Extended.q19AsofJoin(spark, sf)
    // q19 rows whose matched order is within 90 days of the event: q81 agrees
    val e = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts"))
    val within = unb.join(e, "event_id")
      .withColumn("inWin", col("asof_orderdate") > col("ts") - expr("INTERVAL 90 DAYS"))
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("asof_orderkey"), r.getAs[Boolean]("inWin")))
    assert(within.nonEmpty && within.exists(!_._3), "fixture must exercise the null branch")
    within.foreach { case (id, key, in) =>
      if (in) assert(tol(id).contains(key), s"event $id should match $key")
      else assert(tol(id).isEmpty, s"event $id beyond tolerance must be null")
    }
    // every event appears exactly once (outer contract), and events with
    // NO prior order at all (absent from q19) are null a fortiori
    assert(tol.size == e.count())
    val inQ19 = within.map(_._1).toSet
    tol.foreach { case (id, v) => if (!inQ19.contains(id)) assert(v.isEmpty) }
  }

  test("tolerance exec: scored q82 equals q81's declarative form row for row") {
    val got = graft.queries.Extended.q82AsofToleranceExec(spark, sf).collect().toSeq
    val want = graft.queries.Extended.q81AsofTolerance(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("tolerance exec: inner = outer minus nulls; boundary is strictly exclusive") {
    import spark.implicits._
    val tol = 10L
    // key 1: candidate at t−10 (boundary → stale), t−9 (fresh), none
    val lefts = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L))
      .toDF("k", "t", "left_id")
    val rights = Seq((1L, 90L, 7L), (1L, 191L, 8L))
      .toDF("k", "t", "payload")
    val outer = AsofJoin.asofOuterTolerance(lefts, rights, tol).collect()
      .map(r => r.getAs[Long]("left_id") ->
        Option(r.getAs[java.lang.Long]("payload")).map(_.toLong)).toMap
    // left 1: cand time 90 = 100−10 → NOT > boundary → stale → null
    // left 2: cand time 191 > 200−10 = 190 → fresh
    assert(outer == Map(1L -> None, 2L -> Some(8L), 3L -> None))
    val inner = AsofJoin.asofTolerance(lefts, rights, tol).collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("payload"))).toSet
    assert(inner == Set((2L, 8L)))
    // and with the window widened one microsecond the boundary row matches
    val wider = AsofJoin.asofTolerance(lefts, rights, tol + 1).collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("payload"))).toSet
    assert(wider == Set((1L, 7L), (2L, 8L)))
  }

  test("numOutputRows metric on the exec matches the actual output count") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findExec(p: SparkPlan): Option[graft.plans.AsofMergeJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
      case q: QueryStageExec => findExec(q.plan)
      case e: graft.plans.AsofMergeJoinExec => Some(e)
      case other => other.children.view.flatMap(findExec(_)).headOption
    }
    val df = AsofJoin.asof(eventsDf, ordersDf)
    val got = df.collect().length.toLong
    val m = findExec(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value)
    assert(m.contains(got), s"metric $m vs rows $got")
  }

  test("plan: the custom exec plans via the injected strategy — no union, window, or join") {
    val df = AsofJoin.asof(eventsDf, ordersDf)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix — the physical node prints
    // as "AsofMergeJoin" (the logical node never reaches executedPlan)
    assert(plan.contains("AsofMergeJoin"), s"expected the custom exec:\n$plan")
    assert(!plan.contains("Union") && !plan.contains("windowspecdefinition")
        && !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"the merge exec must replace the declarative machinery:\n$plan")
    // Catalyst owns the physical prerequisites: a hash exchange + sort per side
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 2,
      s"expected both sides clustered on the key by EnsureRequirements:\n$plan")
    assert("\\bSort \\[".r.findAllIn(plan).size >= 2,
      s"expected Catalyst-inserted sorts on both sides:\n$plan")
  }
}
