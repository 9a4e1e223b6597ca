package graft

/** Solo-query timer: `sbt "Test/runMain graft.QueryTimer <name> [sfDir]"`
  * — warmup + two timed passes of one SparkEntry query, mirroring Bench's
  * protocol, for profiling a single battery entry without battery noise. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Bench.session()
    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      drop(); s
    }
    once() // warmup
    val t = math.min(once(), once())
    println(f"""{"query":"$name","sec":$t%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
