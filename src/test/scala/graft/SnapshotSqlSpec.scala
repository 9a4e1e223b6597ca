package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotStore
import graft.util.Fs

/** Laws of the snapshot table's SQL/catalog surface
  * (graft.plans.SnapshotSqlRules) and of the public change-feed
  * streaming source (graft.sources.v2.SnapshotCdcSource). */
class SnapshotSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.t(spark, sf, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  private def withTable[A](f: String => A): A = {
    val tmp = Files.createTempDirectory("graft-sql").toFile
    try f(new java.io.File(tmp, "t").getAbsolutePath)
    finally Fs.deleteTree(tmp)
  }

  test("SQL surface: CTAS, INSERT INTO/OVERWRITE commit atomically, time travel reads") {
    withTable { path =>
      docs.createOrReplaceTempView("docs_sqlspec")
      spark.sql("DROP TABLE IF EXISTS sqlspec")
      try {
        spark.sql("CREATE TABLE sqlspec USING `graft-snapshot` " +
          s"OPTIONS (path '$path') AS SELECT * FROM docs_sqlspec WHERE doc_id < 100")
        assert(SnapshotStore.versions(spark, path) == Seq(1L))
        spark.sql("INSERT INTO sqlspec SELECT * FROM docs_sqlspec WHERE doc_id >= 100")
        assert(SnapshotStore.versions(spark, path) == Seq(1L, 2L),
          "INSERT INTO must land as ONE versioned commit")
        assert(spark.table("sqlspec").count() == docs.count())
        // the stock path would have dropped an unreferenced parquet in
        // the table root — the reroute must leave none
        val stray = Option(new java.io.File(path).listFiles())
          .getOrElse(Array.empty).filter(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(stray.isEmpty, s"INSERT bypassed the manifest: ${stray.toSeq}")
        spark.sql("INSERT OVERWRITE sqlspec SELECT * FROM docs_sqlspec WHERE lang = 'en'")
        assert(SnapshotStore.versions(spark, path) == Seq(1L, 2L, 3L))
        assert(spark.table("sqlspec").count() == docs.filter(col("lang") === "en").count())
        // SQL time travel: the pre-overwrite version still reads whole
        assert(spark.sql("SELECT count(*) FROM sqlspec VERSION AS OF 2")
          .head.getLong(0) == docs.count())
        val nowIso = java.time.Instant.now().toString
        assert(spark.sql(
          s"SELECT count(*) FROM sqlspec TIMESTAMP AS OF '$nowIso'").head.getLong(0) ==
          spark.table("sqlspec").count())
        // column projection through time travel resolves fine
        assert(spark.sql("SELECT sum(n_chars) FROM sqlspec VERSION AS OF 1")
          .head.getLong(0) ==
          docs.filter(col("doc_id") < 100).agg(sum("n_chars")).head.getLong(0))
      } finally {
        spark.sql("DROP TABLE IF EXISTS sqlspec")
        spark.catalog.dropTempView("docs_sqlspec"): Unit
      }
    }
  }

  test("time travel rule leaves non-graft tables to the stock refusal") {
    spark.sql("DROP TABLE IF EXISTS plainparq")
    val tmp = Files.createTempDirectory("graft-sql-plain").toFile
    try {
      val p = new java.io.File(tmp, "t").getAbsolutePath
      docs.limit(5).write.parquet(p)
      spark.sql(s"CREATE TABLE plainparq USING parquet OPTIONS (path '$p')")
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM plainparq VERSION AS OF 1").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL") ||
        e.getMessage.toLowerCase.contains("time travel"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS plainparq")
      Fs.deleteTree(tmp)
    }
  }

  test("SQL DML: DELETE/UPDATE/MERGE map onto atomic ops; non-graft tables still refuse") {
    withTable { path =>
      docs.createOrReplaceTempView("docs_dml")
      spark.sql("DROP TABLE IF EXISTS dmlspec")
      try {
        spark.sql("CREATE TABLE dmlspec USING `graft-snapshot` " +
          s"OPTIONS (path '$path') AS SELECT * FROM docs_dml")
        spark.sql("DELETE FROM dmlspec WHERE lang = 'de'")
        assert(spark.table("dmlspec").filter(col("lang") === "de").count() == 0)
        assert(spark.table("dmlspec").count() ==
          docs.filter(col("lang") =!= "de").count())
        spark.sql("UPDATE dmlspec SET n_chars = n_chars + 1000000 WHERE lang = 'zh'")
        assert(spark.table("dmlspec").filter(col("n_chars") > 900000L).count() ==
          docs.filter(col("lang") === "zh").count())
        // MERGE: canonical upsert — updates replace, inserts land, once
        docs.filter(col("doc_id") < 10)
          .withColumn("n_chars", lit(-7L)).createOrReplaceTempView("src_dml")
        spark.sql("""MERGE INTO dmlspec USING src_dml s
          |ON dmlspec.doc_id = s.doc_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        assert(spark.table("dmlspec").filter(col("n_chars") === -7L).count() == 10)
        assert(spark.table("dmlspec").count() ==
          docs.filter(col("lang") =!= "de").count() +
            docs.filter(col("doc_id") < 10 && col("lang") === "de").count())
        // every statement was one atomic versioned commit
        assert(SnapshotStore.versions(spark, path) == Seq(1L, 2L, 3L, 4L))
        val ops = SnapshotStore.history(spark, path)
          .orderBy(col("version")).collect().map(_.getString(1)).toSeq
        assert(ops == Seq("create", "delete", "update", "merge"), ops.toString)
        // non-canonical MERGE refuses loudly
        val e = intercept[Exception] {
          spark.sql("""MERGE INTO dmlspec USING src_dml s
            |ON dmlspec.doc_id = s.doc_id
            |WHEN MATCHED THEN DELETE""".stripMargin)
        }
        assert(e.getMessage.contains("canonical"), e.getMessage)
        // DML on a NON-graft table still hits the stock v2-only refusal
        val tmp2 = Files.createTempDirectory("graft-sql-dml").toFile
        try {
          val p2 = new java.io.File(tmp2, "t").getAbsolutePath
          docs.limit(5).write.parquet(p2)
          spark.sql(s"CREATE TABLE dmlplain USING parquet OPTIONS (path '$p2')")
          val e2 = intercept[Exception] {
            spark.sql("DELETE FROM dmlplain WHERE doc_id = 1")
          }
          assert(e2.getMessage.toLowerCase.contains("v2") ||
            e2.getMessage.contains("DELETE"), e2.getMessage)
        } finally {
          spark.sql("DROP TABLE IF EXISTS dmlplain")
          Fs.deleteTree(tmp2)
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS dmlspec")
        spark.catalog.dropTempView("docs_dml")
        spark.catalog.dropTempView("src_dml"): Unit
      }
    }
  }

  test("change feed source: versions deliver once, startingVersion honored, gaps refuse") {
    withTable { path =>
      import org.apache.spark.sql.streaming.Trigger
      val base = new java.io.File(path).getParentFile
      def ckpt(i: Int) = new java.io.File(base, s"ck$i").getAbsolutePath
      val sink = new java.io.File(base, "sink").getAbsolutePath
      SnapshotStore.create(spark, docs.filter(col("doc_id") < 50), path)
      SnapshotStore.append(spark, docs.filter(col("doc_id").between(50, 99)), path)
      SnapshotStore.deleteWhere(spark, path, col("doc_id") < 10)
      def drain(checkpoint: String, startingVersion: Long): Unit = {
        val q = spark.readStream.format("graft-snapshot")
          .option("readChangeFeed", "true")
          .option("startingVersion", startingVersion).load(path)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(sink): Unit
          }.start()
        q.awaitTermination()
      }
      drain(ckpt(1), 1L)
      val got = spark.read.parquet(sink)
      // v1: 50 inserts; v2: 50 inserts; v3: 10 deletes
      assert(got.count() == 110)
      assert(got.filter(col("_commit_version") === 1L &&
        col("_change_type") === "insert").count() == 50)
      assert(got.filter(col("_commit_version") === 3L &&
        col("_change_type") === "delete").count() == 10)
      // replay on the same checkpoint: nothing new → nothing appended
      drain(ckpt(1), 1L)
      assert(spark.read.parquet(sink).count() == 110)
      // a NEW commit drains incrementally on the same lineage
      SnapshotStore.append(spark, docs.filter(col("doc_id") === 100), path)
      drain(ckpt(1), 1L)
      assert(spark.read.parquet(sink).count() == 111)
      assert(spark.read.parquet(sink)
        .agg(max(col("_commit_version"))).head.getLong(0) == 4L)
      // startingVersion skips the initial snapshot
      val sink2 = new java.io.File(base, "sink2").getAbsolutePath
      val q2 = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("startingVersion", 3).load(path)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt(2))
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(sink2): Unit
        }.start()
      q2.awaitTermination()
      assert(spark.read.parquet(sink2).count() == 11) // v3 deletes + v4 insert
      // plain streaming read (no readChangeFeed) refuses with guidance
      val e = intercept[Exception] {
        spark.readStream.format("graft-snapshot").load(path)
      }
      assert(e.getMessage.contains("readChangeFeed"), e.getMessage)
      // vacuum ages v1..v2 out: a fresh full-history subscription refuses
      SnapshotStore.vacuum(spark, path, keepVersions = 2)
      val e2 = intercept[Exception] { drain(ckpt(3), 1L) }
      assert(e2.getMessage.contains("non-contiguous") ||
        Option(e2.getCause).exists(_.getMessage.contains("non-contiguous")),
        s"${e2.getMessage} / ${Option(e2.getCause).map(_.getMessage)}")
    }
  }
}
