package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Micro-benchmark for the unbounded cluster path (run via
  * `sbt "Test/runMain graft.ClusterPathBench [sfDir]"`): times the
  * rep-graph composition (nearDupClustersUnbounded) against the doc-pair
  * composition it replaced (dedupClusters over the miner's doc-level
  * pairs) on the self-similar documents corpus. Both answers are asserted
  * equal; the timing difference is the rep-collapse economy — the
  * union-find input is |distinct sets| edges vs the doc-pair blowup.
  * Warmup pass first, then min of two timed passes, mirroring Bench. */
object ClusterPathBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"))

    def repGraph() = TextDedup.nearDupClustersUnbounded(docs, 0.9)
    def docPairs() = TextDedup.dedupClusters(TextDedup.minhashNearDupsUnbounded(docs, 0.9))

    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); val s = (System.nanoTime() - t0) / 1e9
      drop(); s
    }
    // equality first (also the warmup pass)
    val a = repGraph().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    drop()
    val b = docPairs().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    drop()
    assert(a == b, s"cluster sets differ: ${a.size} vs ${b.size}")
    val rep = math.min(time(repGraph _), time(repGraph _))
    val doc = math.min(time(docPairs _), time(docPairs _))
    println(f"""{"rep_graph_sec":$rep%.2f,"doc_pairs_sec":$doc%.2f,"clusters":${a.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
