package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ChangeData

/** Reference laws for the change-data/journey battery (q56–q60): each
  * distributed formulation is replayed by a small driver-side reference on
  * the sf0.001 events and must agree exactly. */
class ChangeDataSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (user_id, event_type, ts_micros, event_id, cents) — the same µs
  // truncation + cents rounding the queries apply
  private lazy val evs: Seq[(Long, String, Long, Long, Long)] =
    Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "event_id",
        "cast(round(value * 100) as bigint)")
      .as[(Long, String, Long, Long, Long)].collect().toSeq

  test("q56: latest-wins merge matches a driver-side reference replay") {
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, changes) =>
      val last = changes.maxBy { case (_, _, ts, id, _) => (ts, id) }
      if (last._2 == "error") None else Some((u, last._2, last._5))
    }.sortBy(_._1)
    val got = ChangeData.q56CdcMerge(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }

  test("upsert compact: version ties resolve deterministically by content") {
    import spark.implicits._
    // two changes for one key TIE on version with different payloads: the
    // fold-order-independence law must still hold — content breaks the tie
    def run(rows: Seq[(Long, Long, String)], parts: Int): Set[(Long, Long, String)] =
      graft.operators.UpsertState.compact(
        rows.toDF("k", "v", "payload").repartition(parts),
        keys = Seq("k"), version = Seq("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val fwd = run(Seq((1L, 5L, "alpha"), (1L, 5L, "beta"), (2L, 1L, "x")), 1)
    val rev = run(Seq((2L, 1L, "x"), (1L, 5L, "beta"), (1L, 5L, "alpha")), 4)
    assert(fwd == rev, "tied versions must not make the state fold-order-dependent")
    assert(fwd == Set((1L, 5L, "beta"), (2L, 1L, "x")),
      "the content-greatest payload wins a version tie (max_by)")
  }

  test("q57: SCD2 intervals chain (valid_to = next valid_from) and close exactly once per key") {
    val rows = ChangeData.q57Scd2(spark, sf)
      .selectExpr("user_id", "change_id",
        "unix_micros(cast(valid_from as timestamp))",
        "coalesce(unix_micros(cast(valid_to as timestamp)), -1)", "is_current")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val s = vs.sortBy(r => (r._3, r._2))
      // every version but the last ends where the next begins; only the
      // last is open/current
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._3 && !a._5, s"user $u: broken chain")
        case _         => ()
      }
      assert(s.last._4 == -1 && s.last._5, s"user $u: last version must be open")
      assert(s.count(_._5) == 1, s"user $u: exactly one current version")
    }
    assert(rows.length == evs.length)
  }

  test("q58: hierarchical sweep equals a driver-side single-pass sweep") {
    val want = evs.groupBy(_._2).toSeq.map { case (tpe, es) =>
      val pts = es.flatMap { case (_, _, ts, id, _) =>
        Seq((ts, 1, id), (ts + 30L * 60 * 1000000, -1, id))
      }.sortBy { case (t, d, id) => (t, d, id) }
      val sums = pts.scanLeft(0L) { case (acc, (_, d, _)) => acc + d }.drop(1)
      (tpe, sums.max, es.length.toLong)
    }.sortBy(_._1)
    val got = ChangeData.q58SweepConcurrency(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q59: value-domain median equals the sort-based lower median") {
    val want = evs.groupBy(_._2).toSeq.map { case (tpe, es) =>
      val sorted = es.map(_._5).sorted
      (tpe, es.length.toLong, sorted((es.length + 1) / 2 - 1))
    }.sortBy(_._1)
    val got = ChangeData.q59ExactMedian(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("bucketed upsert state: partition-swap merge equals the flat merge; untouched buckets untouched") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_bucketed_state_")
    val state = root.resolve("state").toString
    val log = Tables.t(spark, sf, "events").selectExpr(
      "user_id", "event_type", "unix_micros(ts) as ts_us", "event_id",
      "cast(round(value * 100) as bigint) as cents")
    val keys = Seq("user_id"); val ver = Seq("ts_us", "event_id")
    // three interleaved slices merge bucket-wise…
    for (m <- 0 to 2)
      graft.operators.UpsertState.mergeBucketed(spark,
        log.filter(col("event_id") % 3 === m), state, keys, ver, nBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_type", "ts_us", "event_id", "cents")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val want = rows(graft.operators.UpsertState.compact(log, keys, ver))
    assert(rows(spark.read.parquet(state)) == want && want.nonEmpty)
    // …and a single-key batch rewrites ONLY that key's bucket directory
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(state)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = files()
    val one = log.orderBy(col("event_id")).limit(1) // re-delivery: state-invariant
    graft.operators.UpsertState.mergeBucketed(spark, one, state, keys, ver, nBuckets = 8)
    assert(rows(spark.read.parquet(state)) == want)
    val touchedBucket = one.select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("user_id")),
        org.apache.spark.sql.functions.lit(8))).head().getInt(0)
    val untouchedBefore = before.filterNot(_._1.contains(s"bucket=$touchedBucket"))
    val after = files()
    untouchedBefore.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"untouched bucket file rewritten: $p")
    }
    graft.util.Fs.deleteTree(root.toFile)
  }

  test("q60: funnel stages match a reference replay and are monotone") {
    val byUser = evs.groupBy(_._1)
    def minAfter(tpe: String, after: Map[Long, Long]): Map[Long, Long] =
      after.flatMap { case (u, gate) =>
        byUser(u).collect { case (_, t, s, _, _) if t == tpe && s > gate => s }
          .minOption.map(u -> _)
      }
    val s1 = byUser.flatMap { case (u, es) =>
      es.collect { case (_, "view", s, _, _) => s }.minOption.map(u -> _) }
    val s2 = minAfter("click", s1)
    val s3 = minAfter("purchase", s2)
    val got = ChangeData.q60Funnel(spark, sf).as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_view", s1.size.toLong), ("2_click", s2.size.toLong),
      ("3_purchase", s3.size.toLong)))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "funnel must be monotone")
  }

  test("q84: median/MAD outlier flags match a driver-side definitional replay") {
    val prices = Tables.t(spark, sf, "orders")
      .selectExpr("o_orderpriority", "cast(round(o_totalprice * 100) as bigint)")
      .as[(String, Long)].collect().toSeq
    // percentile_disc(0.5): first value whose cume_dist reaches 0.5 — the
    // element at 1-based position ceil(n/2) in sorted order
    def disc50(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val want = prices.groupBy(_._1).toSeq.map { case (p, g) =>
      val vs = g.map(_._2)
      val med = disc50(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = disc50(devs)
      (p, med, mad, vs.size.toLong, devs.count(_ > 3 * mad).toLong)
    }.sortBy(_._1)
    val got = ChangeData.q84MadOutliers(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }
}
