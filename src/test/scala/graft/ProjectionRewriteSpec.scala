package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ProjectionCatalog

/** Soundness gates for the covering-projection rewrite: the scan swap
  * must fire on exactly the covered shapes and leave everything else
  * untouched (q113 scores the positive path against the DuckDB oracle;
  * these pin the refusals and the exact row-multiset contract).
  */
class ProjectionRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private def qtyCents = round(col("l_quantity") * 100).cast("long")
  private def yr96 =
    col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
      col("l_shipdate") < lit("1997-01-01").cast(TimestampType)

  private def withProj(f: => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_projspec_").toFile
    try {
      val projPath = new java.io.File(tmp, "lineitem_proj").getAbsolutePath
      // the shared build/registration path q113 also uses
      graft.queries.Extended.buildLineitemProj(spark, sf, projPath)
      graft.queries.Extended.registerLineitemProj(spark, projPath)
      try f finally ProjectionCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("a covered scan is served from the projection, row-multiset exact") {
    withProj {
      val li = Tables.t(spark, sf, "lineitem")
      // a NON-aggregate consumer: the projection preserves the exact row
      // multiset, so raw rows must come back identical
      def rows = li.filter(yr96)
        .select(col("l_shipdate"), col("l_returnflag"), col("l_quantity"))
        .orderBy(col("l_shipdate"), col("l_returnflag"), col("l_quantity"))
      val viaProj = rows
      val plan = viaProj.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_proj") && !plan.contains("lineitem.parquet"))
      val got = viaProj.collect().toSeq
      ProjectionCatalog.clear()
      assert(got == rows.collect().toSeq && got.nonEmpty)
    }
  }

  test("an uncovered column blocks the swap (projection is missing it)") {
    withProj {
      val li = Tables.t(spark, sf, "lineitem")
      val priced = li.filter(yr96)
        .groupBy(col("l_returnflag"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("s"))
      assert(!priced.queryExecution.executedPlan.toString.contains("lineitem_proj"),
        "a measure over an uncovered column must read the base table")
      val filtered = li.filter(col("l_partkey") > 100 && yr96)
        .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
      assert(!filtered.queryExecution.executedPlan.toString.contains("lineitem_proj"),
        "a predicate on an uncovered column must read the base table")
    }
  }

  test("a multi-root scan never matches; the narrowest covering projection wins") {
    withProj {
      val tmp = java.nio.file.Files.createTempDirectory("graft_projspec2_").toFile
      try {
        // multi-root: extra roots carry rows the projection never stored
        val extra = new java.io.File(tmp, "extra.parquet").getAbsolutePath
        Tables.t(spark, sf, "lineitem").limit(10).write.parquet(extra)
        val multi = spark.read.parquet(s"$sf/lineitem.parquet", extra)
          .filter(yr96).groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        assert(!multi.queryExecution.executedPlan.toString.contains("lineitem_proj"))
        // a second, NARROWER projection covering the same query must win
        val narrow = new java.io.File(tmp, "lineitem_proj_narrow").getAbsolutePath
        Tables.t(spark, sf, "lineitem")
          .select(col("l_shipdate"), col("l_returnflag"))
          .sort(col("l_shipdate")).write.parquet(narrow)
        ProjectionCatalog.register(ProjectionCatalog.ProjDef(
          "lineitem.parquet", Set("l_shipdate", "l_returnflag"),
          spark.read.parquet(narrow).queryExecution.analyzed))
        val counted = Tables.t(spark, sf, "lineitem").filter(yr96)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val plan = counted.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem_proj_narrow"),
          s"the narrowest sufficient projection must be chosen:\n$plan")
        val got = counted.orderBy(col("l_returnflag")).collect().toSeq
        ProjectionCatalog.clear()
        assert(got == Tables.t(spark, sf, "lineitem").filter(yr96)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")).collect().toSeq && got.nonEmpty)
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("projection and MV compose: the MV answers the aggregate it covers, the projection the rest") {
    withProj {
      val tmp = java.nio.file.Files.createTempDirectory("graft_projmv_").toFile
      try {
        val mvPath = new java.io.File(tmp, "lineitem_mv").getAbsolutePath
        graft.queries.Extended.buildLineitemMv(spark, sf, mvPath)
        graft.queries.Extended.registerLineitemMv(spark, sf, mvPath)
        try {
          // grain aggregate, no filter: the MV wins (it runs first and
          // removes the base scan the projection would have matched)
          val grain = Tables.t(spark, sf, "lineitem")
            .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
          assert(grain.queryExecution.executedPlan.toString.contains("lineitem_mv"))
          // a within-group (non-grain) filter refuses the MV but its
          // columns are covered: the projection serves it
          val windowed = Tables.t(spark, sf, "lineitem").filter(yr96)
            .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
          val plan = windowed.queryExecution.executedPlan.toString
          assert(!plan.contains("lineitem_mv") && plan.contains("lineitem_proj"),
            s"the projection must catch what the MV refuses:\n$plan")
          val got = windowed.orderBy(col("l_returnflag")).collect().toSeq
          graft.plans.MvCatalog.clear(); ProjectionCatalog.clear()
          assert(got == Tables.t(spark, sf, "lineitem").filter(yr96)
            .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
            .orderBy(col("l_returnflag")).collect().toSeq && got.nonEmpty)
        } finally graft.plans.MvCatalog.clear()
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("file-identity consumers refuse; a base-suffix-named projection is rejected at register") {
    withProj {
      // input_file_name observes WHICH files are read — the one thing
      // the physical swap changes; the consumer must keep the base scan
      val files = Tables.t(spark, sf, "lineitem").filter(yr96)
        .select(col("l_returnflag"), input_file_name().as("f"))
      assert(!files.queryExecution.executedPlan.toString.contains("lineitem_proj"),
        "a file-identity consumer must read the base table")
      // a projection whose own path matches the base suffix would
      // re-match its own substitution forever — rejected up front
      val tmp = java.nio.file.Files.createTempDirectory("graft_projbad_").toFile
      try {
        val bad = new java.io.File(tmp, "lineitem.parquet").getAbsolutePath
        Tables.t(spark, sf, "lineitem").select(col("l_returnflag")).write.parquet(bad)
        intercept[IllegalArgumentException] {
          ProjectionCatalog.register(ProjectionCatalog.ProjDef(
            "lineitem.parquet", Set("l_returnflag"),
            spark.read.parquet(bad).queryExecution.analyzed))
        }
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("a mis-registered narrower candidate falls through to the valid wider one") {
    withProj {
      val tmp = java.nio.file.Files.createTempDirectory("graft_projfall_").toFile
      try {
        // narrower candidate whose DECLARED cols don't exist in its own
        // parquet (schema drift) — must fall through, not abort
        val drifted = new java.io.File(tmp, "lineitem_proj_drift").getAbsolutePath
        Tables.t(spark, sf, "lineitem")
          .select(col("l_shipdate").as("ship_ts"), col("l_returnflag").as("flag"))
          .write.parquet(drifted)
        ProjectionCatalog.register(ProjectionCatalog.ProjDef(
          "lineitem.parquet", Set("l_shipdate", "l_returnflag"),
          spark.read.parquet(drifted).queryExecution.analyzed))
        val counted = Tables.t(spark, sf, "lineitem").filter(yr96)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val plan = counted.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem_proj") && !plan.contains("lineitem_proj_drift"),
          s"the drifted candidate must fall through to the valid projection:\n$plan")
        val got = counted.orderBy(col("l_returnflag")).collect().toSeq
        ProjectionCatalog.clear()
        assert(got == Tables.t(spark, sf, "lineitem").filter(yr96)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")).collect().toSeq && got.nonEmpty)
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("registerVerified: stale and tampered projections are detected and refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_projfresh_").toFile
    try {
      import graft.plans.ProjectionCatalog
      val basePath = new java.io.File(tmp, "li_main.parquet").getAbsolutePath
      val cols = Seq("l_shipdate", "l_returnflag", "l_quantity")
      val li = Tables.t(spark, sf, "lineitem")
      li.write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      def defFor(p: String) = ProjectionCatalog.ProjDef(
        "li_main.parquet", cols.toSet,
        spark.read.parquet(p).queryExecution.analyzed)
      // STALE: the projection missed the last maintenance append
      val stale = new java.io.File(tmp, "proj_stale").getAbsolutePath
      li.filter(col("l_orderkey") % 7 =!= 0).selectExpr(cols: _*).write.parquet(stale)
      intercept[IllegalArgumentException] {
        ProjectionCatalog.registerVerified(base, spark.read.parquet(stale), defFor(stale))
      }
      // TAMPERED: same row count, one value edited
      val tampered = new java.io.File(tmp, "proj_tampered").getAbsolutePath
      li.selectExpr(cols: _*)
        .withColumn("l_quantity",
          when(col("l_quantity") === 1.0, 2.0).otherwise(col("l_quantity")))
        .write.parquet(tampered)
      intercept[IllegalArgumentException] {
        ProjectionCatalog.registerVerified(base, spark.read.parquet(tampered), defFor(tampered))
      }
      assert(ProjectionCatalog.all.isEmpty, "refused projections must not register")
      // FRESH: exact multiset passes regardless of partitioning, row
      // order, or stored column order
      val fresh = new java.io.File(tmp, "proj_fresh").getAbsolutePath
      li.selectExpr("l_quantity", "l_returnflag", "l_shipdate") // reordered
        .repartition(7).write.parquet(fresh)
      ProjectionCatalog.registerVerified(base, spark.read.parquet(fresh), defFor(fresh))
      assert(ProjectionCatalog.all.size == 1)
      ProjectionCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("registerVerified runs under the base table's lease: no verify-then-register window") {
    // atomicity vs maintenance: a maintainer holding the base's Lease
    // (an in-flight append) makes registration REFUSE with HeldException
    // instead of fingerprinting a base that is about to change under it —
    // and a registration in progress symmetrically blocks maintenance,
    // because both sides contend on the same lease point
    val tmp = java.nio.file.Files.createTempDirectory("graft_projlease_").toFile
    try {
      import graft.plans.ProjectionCatalog
      import graft.operators.Lease
      val basePath = new java.io.File(tmp, "li_main.parquet").getAbsolutePath
      val cols = Seq("l_shipdate", "l_returnflag", "l_quantity")
      val li = Tables.t(spark, sf, "lineitem")
      li.write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      val proj = new java.io.File(tmp, "proj").getAbsolutePath
      li.selectExpr(cols: _*).write.parquet(proj)
      val d = ProjectionCatalog.ProjDef("li_main.parquet", cols.toSet,
        spark.read.parquet(proj).queryExecution.analyzed)
      val live = new org.apache.hadoop.fs.Path(basePath)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Lease.acquire(fs, live, "dedup append") // in-flight maintenance
      intercept[Lease.HeldException] {
        ProjectionCatalog.registerVerified(base, spark.read.parquet(proj), d)
      }
      assert(ProjectionCatalog.all.isEmpty,
        "a registration refused by the lease must not register")
      Lease.release(fs, live)
      // maintenance done: registration proceeds and releases the lease
      ProjectionCatalog.registerVerified(base, spark.read.parquet(proj), d)
      assert(ProjectionCatalog.all.size == 1)
      assert(!fs.exists(live.suffix("__lease")),
        "registration must release the base lease")
      ProjectionCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("empty registry is a strict no-op") {
    val plan = Tables.t(spark, sf, "lineitem").filter(yr96)
      .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem_proj"))
  }
}
