package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the shipped surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = Tables.t(spark, sfDir, "documents")
    import graft.operators.TextDedup
    import graft.queries.Extended

    which match {
      case "clusters" =>
        import graft.queries.LlmData
        def drop(): Unit =
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        LlmData.x35DedupClusters(spark, sfDir).count(); drop() // warm
        time("x35 clusters")(LlmData.x35DedupClusters(spark, sfDir).count()); drop()
        time("x35 clusters2")(LlmData.x35DedupClusters(spark, sfDir).count()); drop()
        LlmData.x37IncrementalClusters(spark, sfDir).count(); drop() // warm
        time("x37 incr")(LlmData.x37IncrementalClusters(spark, sfDir).count()); drop()
        time("x37 incr2")(LlmData.x37IncrementalClusters(spark, sfDir).count()); drop()
      case "simhash" =>
        TextDedup.simhashNearDups(docs, 3).count() // warm
        time("simhash sigs")(TextDedup.simhashSignatures(docs).count())
        time("simhash sigs2")(TextDedup.simhashSignatures(docs).count())
        time("x22 full")(TextDedup.simhashNearDups(docs, 3).count())
        time("x22 full2")(TextDedup.simhashNearDups(docs, 3).count())
      case "minhash" =>
        TextDedup.minhashNearDups(docs, 0.9).count() // warm
        time("x21 full")(TextDedup.minhashNearDups(docs, 0.9).count())
        time("x21 full2")(TextDedup.minhashNearDups(docs, 0.9).count())
        // cached-members variant: upper bound for eliminating recompute
        val members = TextDedup.tokenMasks(docs).select(col("doc_id"), col("mask")).cache()
        members.count()
        time("tokenMasks cached")(members.count())
        val groups = members.groupBy(col("mask")).agg(min(col("doc_id")).as("rep"))
        val repDocs = docs.join(groups.select(col("rep"), col("mask")), docs("doc_id") === col("rep"))
        val sigs = TextDedup.minhashSignatures(repDocs.select(col("doc_id"), col("text")))
        time("sigs(reps)")(sigs.count())
        val sigsM = sigs.join(broadcast(repDocs.select(col("doc_id"), col("mask"))), "doc_id")
        time("verified repPairs")(TextDedup.minhashVerifiedRepPairs(sigsM, 0.9).count())
      case "asof" =>
        Extended.q19AsofJoin(spark, sfDir).count() // warm
        time("q19 asof")(Extended.q19AsofJoin(spark, sfDir).count())
        time("q19 asof2")(Extended.q19AsofJoin(spark, sfDir).count())
      case "minhash-persist" =>
        import org.apache.spark.sql.DataFrame
        def variant(persist: Boolean): Long = {
          val members0 = TextDedup.tokenMasks(docs).select(col("doc_id"), col("mask"))
          val members = if (persist) members0.localCheckpoint(true) else members0
          val groups = members.groupBy(col("mask")).agg(min(col("doc_id")).as("rep"))
          val repDocs = docs.join(groups.select(col("rep"), col("mask")), docs("doc_id") === col("rep"))
          val sigs = TextDedup.minhashSignatures(repDocs.select(col("doc_id"), col("text")))
            .join(broadcast(repDocs.select(col("doc_id"), col("mask"))), "doc_id")
          val repPairs = TextDedup.minhashVerifiedRepPairs(sigs, 0.9)
          val cross = members.select(col("doc_id").as("da"), col("mask").as("a_mask"))
            .join(broadcast(repPairs), "a_mask")
            .join(members.select(col("doc_id").as("db"), col("mask").as("b_mask")), "b_mask")
            .select(least(col("da"), col("db")).as("a_id"),
                    greatest(col("da"), col("db")).as("b_id"), col("jacc"))
          val intra = members.select(col("doc_id").as("a_id"), col("mask"))
            .join(members.select(col("doc_id").as("b_id"), col("mask")), "mask")
            .filter(col("a_id") < col("b_id"))
            .select(col("a_id"), col("b_id"), lit(1.0).as("jacc"))
          cross.unionByName(intra).count()
        }
        variant(false); variant(true) // warm both
        time("x21 no-persist")(variant(false))
        time("x21 persist")(variant(true))
        time("x21 no-persist2")(variant(false))
        time("x21 persist2")(variant(true))
      case "explain-new" =>
        import graft.queries.TrainingData
        for ((n, q) <- Seq(
          "x38" -> TrainingData.x38Decontaminate _,
          "x39" -> TrainingData.x39SequencePack _,
          "x40" -> TrainingData.x40Boilerplate _,
          "x42" -> TrainingData.x42FuzzyPairs _,
          "x43" -> TrainingData.x43Winnow _)) {
          println(s"==== $n ====")
          println(q(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
        }
      case "x37" =>
        import graft.queries.LlmData
        LlmData.x37IncrementalClusters(spark, sfDir).count() // warm
        time("x37 full")(LlmData.x37IncrementalClusters(spark, sfDir).count())
        val d = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        val batch = d.filter(pmod(col("doc_id"), lit(40)) === 36)
        val existing = d.filter(pmod(col("doc_id"), lit(40)) =!= 36)
        var base: org.apache.spark.sql.DataFrame = null
        time("base clusters") {
          base = TextDedup.nearDupClusters(existing, 0.9).localCheckpoint(true); base.count()
        }
        time("incremental fold") {
          TextDedup.nearDupClustersIncremental(base, existing, batch, 0.9).count()
        }
        time("incremental mining only") {
          TextDedup.minhashNearDupsIncremental(existing, batch, 0.9).count()
        }
      case "x35jobs" =>
        import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit =
            starts.put(js.jobId, (System.nanoTime(), js.properties.getProperty("callSite.short", "?")))
          override def onJobEnd(je: SparkListenerJobEnd): Unit = {
            val (t0, site) = starts.getOrDefault(je.jobId, (0L, "?"))
            println(f"PROF job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
          }
        })
        TextDedup.nearDupClusters(docs, 0.9).count() // warm
        println("PROF ---- timed run ----")
        time("x35 full")(TextDedup.nearDupClusters(docs, 0.9).count())
      case "x35" =>
        TextDedup.nearDupClusters(docs, 0.9).count() // warm
        time("x35 full")(TextDedup.nearDupClusters(docs, 0.9).count())
        val members = TextDedup.tokenMasks(docs).select(col("doc_id"), col("mask")).localCheckpoint(true)
        val groups = members.groupBy(col("mask"))
          .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("grp_n"))
          .localCheckpoint(true)
        time("tokenMasks+groups")(groups.count())
        val repDocs = docs.join(groups.select(col("rep"), col("mask")), docs("doc_id") === col("rep"))
        val sigs = TextDedup.minhashSignatures(repDocs.select(col("doc_id"), col("text")))
          .join(broadcast(repDocs.select(col("doc_id"), col("mask"))), "doc_id")
        time("rep signatures")(sigs.count())
        val verified = TextDedup.minhashVerifiedRepPairs(sigs.localCheckpoint(true), 0.9)
          .localCheckpoint(true)
        time("verified pairs (sigs hot)")(verified.count())
        val m = groups.select(col("rep"), col("mask"))
        val repPairs = m.select(col("mask").as("a_mask"), col("rep").as("ra"))
          .join(broadcast(verified), "a_mask")
          .join(m.select(col("mask").as("b_mask"), col("rep").as("rb")), "b_mask")
          .select(least(col("ra"), col("rb")).as("a_id"),
                  greatest(col("ra"), col("rb")).as("b_id")).localCheckpoint(true)
        time("label prop (pairs hot)")(TextDedup.dedupClusters(repPairs).count())
        // per-round breakdown of the label propagation
        locally {
          val edges = repPairs.select(col("a_id").as("src"), col("b_id").as("dst"))
            .unionByName(repPairs.select(col("b_id").as("src"), col("a_id").as("dst")))
            .localCheckpoint(true)
          var labels = edges.select(col("src").as("id")).distinct()
            .withColumn("label", col("id"))
            .localCheckpoint(true)
          var changed = 1L
          var iter = 0
          while (changed > 0 && iter < 20) {
            val t0 = System.nanoTime()
            val nbr = edges
              .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
              .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_label"))
            val updated = labels
              .join(nbr.select(col("src").as("id"), col("nbr_label")), Seq("id"), "left")
              .select(col("id"), col("label"),
                least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"))
              .localCheckpoint(true)
            val t1 = System.nanoTime()
            changed = updated.filter(col("new_label") =!= col("label")).count()
            labels = updated.select(col("id"), col("new_label").as("label"))
            iter += 1
            println(f"PROF   round $iter: ckpt ${(t1 - t0) / 1e9}%6.3f s  count ${(System.nanoTime() - t1) / 1e9}%6.3f s  changed=$changed")
          }
        }
      case "new" =>
        import graft.queries.LlmData
        LlmData.x29NgramJaccard(spark, sfDir).count() // warm
        time("x29 ngram")(LlmData.x29NgramJaccard(spark, sfDir).count())
        LlmData.x30CosineNearDup(spark, sfDir).count()
        time("x30 cosdup")(LlmData.x30CosineNearDup(spark, sfDir).count())
        LlmData.x31IvfAnn(spark, sfDir).count()
        time("x31 ivf")(LlmData.x31IvfAnn(spark, sfDir).count())
      case "explain" =>
        import graft.queries.{Extended, LlmData, Relational, EventTime}
        val qs: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
          "q23" -> EventTime.q23SlidingAgg(spark, sfDir),
          "q24" -> Extended.q24IntervalJoin(spark, sfDir),
          "q26" -> Relational.q26WindowFrames(spark, sfDir),
          "q27" -> Relational.q27Pivot(spark, sfDir),
          "q28" -> Relational.q28Percentiles(spark, sfDir),
          "q29" -> Relational.q29Correlated(spark, sfDir),
          "q30" -> Relational.q30OuterJoin(spark, sfDir),
          "x30" -> LlmData.x30CosineNearDup(spark, sfDir),
          "x31" -> LlmData.x31IvfAnn(spark, sfDir))
        qs.foreach { case (n, df) =>
          val p = df.queryExecution.executedPlan.toString
          val joins = "(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct|ShuffledHashJoin)".r
            .findAllIn(p).toSeq.groupBy(identity).view.mapValues(_.size).toMap
          val exch = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r.findAllIn(p).size
          println(s"PLAN $n joins=$joins exchanges=$exch codegenSpans=${"WholeStageCodegen".r.findAllIn(p).size}")
        }
      case "finalplan" =>
        // FINAL (post-AQE) plan of a query: run it, then print the
        // re-optimized plan — shows ReusedExchange nodes explain() hides
        val name = args(1)
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count()
        println(df.queryExecution.executedPlan.toString.take(8000))
      case _ => println(
        "usage: Profile clusters|simhash|minhash|minhash-persist|asof|" +
          "x35|x35jobs|x37|new|explain|explain-new|finalplan <q>")
    }
    spark.stop()
  }
}
