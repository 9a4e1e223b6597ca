package graft

/** Micro-bench for the shingle construction path (Test/runMain
  * graft.ShinglePathBench [sfDir]): times the shingle-heavy scored
  * queries so implementation changes to TextDedup.shingles /
  * NGramsGen carry a number. Warmup pass, then min of two. */
object ShinglePathBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("x29_ngram_jaccard", "x43_winnow", "x61_containment",
      "x89_ngram_index")
    val spark = Bench.session()
    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    names.foreach { n => SparkEntry.queries(n)(spark, dir).count(); drop() }
    names.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        drop()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-25s ${times.min}%.2f s")
    }
    spark.stop()
  }
}
