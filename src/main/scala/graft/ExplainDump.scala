package graft

import java.nio.file.{Files, Paths}

/** Plan-capture tool for the optimization rounds: writes
  * `.explain("formatted")` output for the named declared queries to
  * `<outDir>/<name>_<tag>.txt` (the `plans/r10/` evidence files). Building
  * a query's DataFrame runs its setup (lifecycle gates build tables and
  * drain streams), so the captured plan is the FINAL returned frame's plan
  * — exactly what the battery times with `.count()`.
  *
  * Usage: `tools/run.sh graft.ExplainDump <outDir> <tag> [name ...|all]` */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <tag> [names...|all]")
    val outDir = Paths.get(args(0)); Files.createDirectories(outDir): Unit
    val tag = args(1)
    val names =
      if (args.length == 2 || args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${n}_$tag.txt"),
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        println(s"explained $n")
      } catch {
        case e: Throwable => println(s"EXPLAIN FAIL $n: ${e.getMessage}")
      }
      // same hygiene as Bench: drop localCheckpoint blocks between queries
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
