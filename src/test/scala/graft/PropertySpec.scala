package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.functions._

import graft.ingest.Donki
import graft.operators.{DedupAppend, TextDedup}
import graft.queries.Parity

/** Property-based laws (SURVEY.md §5.2): dedup-append idempotence and
  * key-set commutativity on random batches, projection totality under
  * missing keys, cosine bounds, and a differential check of Jaccard pair
  * mining against an in-memory reference implementation.
  *
  * Each case runs real Spark jobs, so minSuccessfulTests is kept small —
  * these are law checks, not fuzzing for throughput. */
object PropertySpec extends Properties("graft") {
  import TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4).withMaxDiscardRatio(10)

  // ---- generators ------------------------------------------------------

  private val genFlr: Gen[Parity.Flr] = for {
    id <- Gen.choose(1, 30)
    ct <- Gen.oneOf("M1.2", "C9.8", "X2.0", "B7.4")
    begin <- Gen.option(Gen.oneOf("2025-05-25T08:24Z", "not-a-timestamp"))
    loc <- Gen.option(Gen.oneOf("N15W60", "S08E22"))
    arn <- Gen.option(Gen.choose(13000, 14000))
  } yield Parity.Flr(f"FLR-$id%03d", ct, begin, begin, begin, loc, arn,
    s"https://api.example/FLR/$id")

  private val genBatch: Gen[List[Parity.Flr]] = Gen.listOfN(8, genFlr)

  private def appendAll(path: String, batches: Seq[Seq[Parity.Flr]]): Map[String, String] =
    try {
      batches.foreach { b =>
        DedupAppend.append(spark, Donki.project(Donki.readJson(spark, Seq(Parity.jsonBody(b)))),
          path, keys = Seq("flr_id"), tieBreak = Seq("class_type", "link"))
      }
      spark.read.parquet(path).collect()
        .map(r => r.getAs[String]("flr_id") -> r.getAs[String]("class_type")).toMap
    } finally graft.util.Fs.deleteTree(new java.io.File(path).getParentFile)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_prop_").resolve("t").toString

  // ---- dedup-append laws ----------------------------------------------

  property("dedupAppend is idempotent: append(A);append(A) == append(A)") =
    forAll(genBatch) { a =>
      a.nonEmpty ==> {
        val once = appendAll(tmp(), Seq(a))
        val twice = appendAll(tmp(), Seq(a, a))
        Prop(once == twice) :| s"once=$once twice=$twice"
      }
    }

  property("dedupAppend key set is order-insensitive: keys(A;B) == keys(B;A)") =
    forAll(genBatch, genBatch) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val ab = appendAll(tmp(), Seq(a, b)).keySet
        val ba = appendAll(tmp(), Seq(b, a)).keySet
        Prop(ab == ba) :| s"ab=$ab ba=$ba"
      }
    }

  // ---- projection totality --------------------------------------------

  property("projection is total under arbitrary missing keys (missing -> null, never throws)") =
    forAll(genBatch) { a =>
      a.nonEmpty ==> {
        val out = Donki.project(Donki.readJson(spark, Seq(Parity.jsonBody(a)))).collect()
        Prop(out.length == a.length)
      }
    }

  // ---- cosine bounds ---------------------------------------------------

  private val genVec: Gen[List[Double]] =
    Gen.listOfN(16, Gen.choose(-2.0, 2.0).suchThat(v => math.abs(v) >= 0.01))

  property("cosineR stays within [-1 - 1e-6, 1]") =
    forAll(genVec, genVec) { (a, b) =>
      import spark.implicits._
      val df = Seq((a.toArray, b.toArray)).toDF("va", "vb")
      val c = df.select(graft.operators.Similarity.cosineR("va", "vb").as("c"))
        .collect()(0).getDouble(0)
      Prop(c >= -1.0 - 1e-6 && c <= 1.0) :| s"cos=$c"
    }

  // ---- Jaccard differential -------------------------------------------

  private val genDoc: Gen[List[String]] = for {
    n <- Gen.choose(3, 12)
    toks <- Gen.listOfN(n, Gen.oneOf((0 until 20).map(i => s"t$i")))
  } yield toks

  property("jaccardPairs equals an in-memory reference on random corpora") =
    forAll(Gen.listOfN(6, genDoc)) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = TextDedup.jaccardPairs(df, 0.3).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sets = docs.map(_.toSet)
      val expected = (for {
        i <- sets.indices; j <- sets.indices if i < j
        inter = (sets(i) & sets(j)).size
        uni = (sets(i) | sets(j)).size
        jacc = inter.toDouble / uni
        if jacc >= 0.3
      } yield (i.toLong, j.toLong) -> jacc).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  // ---- curation laws ---------------------------------------------------

  private val genCorpus: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 10)
    docs <- Gen.listOfN(n, for {
      lang <- Gen.oneOf("en", "de")
      toks <- Gen.choose(1, 30).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf((0 until 15).map(i => s"w$i"))))
    } yield (lang, toks.mkString(" ")))
  } yield docs.zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }

  property("packChunks conserves tokens and fills every non-final chunk exactly") =
    forAll(genCorpus, Gen.choose(4, 64)) { (docs, cap) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "lang", "text")
      val packed = graft.operators.Curation.packChunks(df, cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val totals = docs.groupBy(_._2).view
        .mapValues(_.map(_._3.split(" ").length.toLong).sum).toMap
      val packedTotals = packed.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      val fullExceptLast = packed.groupBy(_._1).forall { case (_, cs) =>
        val last = cs.map(_._2).max
        cs.filter(_._2 != last).forall(_._4 == cap)
      }
      Prop(packedTotals == totals && fullExceptLast) :|
        s"cap=$cap totals=$totals packed=${packed.toSeq}"
    }

  property("packChunks hierarchical prefix sum equals the single-task window form") =
    forAll(genCorpus, Gen.choose(4, 64)) { (docs, cap) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "lang", "text")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val hier = canon(graft.operators.Curation.packChunks(df, cap))
      val win = canon(graft.operators.Curation.packChunksWindowed(df, cap))
      Prop(hier == win) :| s"cap=$cap hier=$hier win=$win"
    }

  property("winnow fingerprints of a doc are a subset of its shingle hashes") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
      val fps = graft.operators.Curation.winnow(df, 3, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: per doc, k-gram h31 hashes
      val P = graft.functions.TextFns.P31
      def h31(s: String): Long =
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
            .take(8).map("%02x".format(_)).mkString.take(15), 16) % P
      val ok = fps.forall { case (id, fp) =>
        val toks = docs.find(_._1 == id).get._3.split(" ")
        toks.sliding(3).exists(g => g.length == 3 && h31(g.mkString(" ")) == fp)
      }
      Prop(ok) :| s"fps=$fps"
    }

  // shared md5-derived 31-bit hash reference (TextFns.h31 in plain JVM)
  private def refH31(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16) % graft.functions.TextFns.P31

  property("segmentDedup equals an in-memory first-occurrence reference") =
    forAll(genCorpus, Gen.choose(2, 8)) { (docs, segK) =>
      import spark.implicits._
      val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
      val got = graft.operators.Curation.segmentDedup(df, segK).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // reference: cut every doc into segK-token spans, first (doc, seg) wins
      val spans = docs.flatMap { case (id, _, text) =>
        text.split(" ").grouped(segK).zipWithIndex
          .map { case (seg, s) => (id, s.toLong, seg.mkString(" "), seg.length.toLong) }
      }
      val firsts = spans.groupBy(_._3).view.mapValues(_.map(t => (t._1, t._2)).min).toMap
      val expected = spans.groupBy(_._1).view.mapValues { ss =>
        val dups = ss.count(t => firsts(t._3) != ((t._1, t._2)))
        val kept = ss.collect { case t if firsts(t._3) == ((t._1, t._2)) => t._4 }.sum
        (ss.size.toLong, dups.toLong, kept)
      }.toMap
      Prop(got == expected) :| s"segK=$segK got=$got expected=$expected"
    }

  property("rebalanceByLang equals the per-doc hash rule") =
    forAll(genCorpus, Gen.choose(1.0, 6.0)) { (docs, k) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "lang", "text")
      val got = graft.operators.Curation.rebalanceByLang(df, k).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val expected = docs.groupBy(_._2).view.mapValues { ds =>
        val n = ds.size.toLong
        val rateU = math.min(1000000L, math.floor(k / math.sqrt(n.toDouble) * 1e6).toLong)
        val sel = ds.count(d => refH31(s"rebal:${d._1}") % 1000000L < rateU).toLong
        (n, rateU, sel)
      }.toMap
      Prop(got == expected) :| s"k=$k got=$got expected=$expected"
    }

  property("retrieveTopK equals an in-memory tf/df-weighted reference") =
    forAll(genCorpus) { docs =>
      (docs.size >= 2) ==> {
        import spark.implicits._
        val (qs, corpus) = docs.partition(_._1 % 3 == 0)
        (qs.nonEmpty && corpus.nonEmpty) ==> {
          val cdf = corpus.map(d => (d._1, d._3)).toDF("doc_id", "text")
          val qdf = qs.map(d => (d._1, d._3)).toDF("doc_id", "text")
          val k = 3
          val got = graft.operators.Curation.retrieveTopK(cdf, qdf, k, 0.5, termK = 2)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
          // reference
          def grams(t: String) = t.split(" ").sliding(2).filter(_.length == 2)
            .map(_.mkString(" ")).toSeq
          val tf = corpus.flatMap(d => grams(d._3).map(g => (d._1, g)))
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
          val df_ = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
          val cap = math.floor(0.5 * corpus.size).toLong
          val expected = (for {
            q <- qs
            qg = grams(q._3).toSet
            c <- corpus if c._1 != q._1
            score = qg.toSeq.collect {
              case g if df_.getOrElse(g, 0L) <= cap && tf.contains((c._1, g)) =>
                tf((c._1, g)) * math.floor(1e12 / (df_(g) + 1)).toLong
            }.sum
            if score > 0
          } yield (q._1, c._1, score)).groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
            rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
              .map { case ((_, cid, sc), i) => (qid, (i + 1).toLong, cid, sc) }
          }.sorted
          Prop(got == expected) :| s"got=$got expected=$expected"
        }
      }
    }

  // ---- corpus-stats laws (x51/x52) -------------------------------------

  property("vocabOov equals the in-memory reference (top-N by count desc, token asc)") =
    forAll(genCorpus, Gen.choose(1, 12)) { (docs, n) =>
      docs.nonEmpty ==> {
        import spark.implicits._
        val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
        val got = graft.operators.CorpusStats.vocabOov(df, n)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
        val freq = docs.flatMap(_._3.split(" ")).groupBy(identity).view.mapValues(_.size).toMap
        val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(n).map(_._1).toSet
        val expected = docs.map { d =>
          val ts = d._3.split(" ")
          val oov = ts.count(!vocab.contains(_)).toLong
          (d._1, ts.length.toLong, oov, oov * 1000000L / ts.length)
        }.sorted
        Prop(got == expected) :| s"n=$n got=$got expected=$expected"
      }
    }

  property("sourceOverlap equals the in-memory shingle-set reference") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      // reuse lang as the source column
      val df = docs.toDF("doc_id", "source", "text")
      val got = graft.operators.CorpusStats.sourceOverlap(df, 3)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      def grams(t: String) = t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
      val sets = docs.groupBy(_._2).view.mapValues(_.flatMap(d => grams(d._3)).toSet).toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        shared = (sets(a) intersect sets(b)).size.toLong if shared > 0
        union = (sets(a) union sets(b)).size.toLong
      } yield (a, b, shared, shared * 1000000L / union)).toSeq.sorted
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("bigramRepetition equals the in-memory reference") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
      val got = graft.operators.CorpusStats.bigramRepetition(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      val expected = docs.flatMap { d =>
        val bgs = d._3.split(" ").sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
        if (bgs.isEmpty) None else {
          val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val n = bgs.size.toLong
          val top = counts.values.max
          val dup = counts.values.filter(_ > 1).sum
          Some((d._1, n, top, top * 1000000L / n, dup * 1000000L / n))
        }
      }.sorted
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("rarityScore equals the in-memory reference") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
      val got = graft.operators.CorpusStats.rarityScore(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      val tf = docs.flatMap(d => d._3.split(" ").map(t => (d._1, t)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dfc = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val w = dfc.map { case (t, c) => t -> math.floor(1e12 / (c + 1)).toLong }
      val expected = docs.map { d =>
        val ts = d._3.split(" ")
        val rarity = ts.toSeq.distinct.map(t => tf((d._1, t)) * w(t)).sum
        (d._1, ts.length.toLong, rarity, rarity / ts.length)
      }.sorted
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("knnClassify equals the in-memory reference (integer-unit cosine, vote tie-breaks)") =
    forAll(
      Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, for {
        lbl <- Gen.choose(0, 2)
        v <- Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 100.0f))
      } yield (lbl, v.toArray))).map(_.zipWithIndex.map {
        case ((l, v), i) => (i.toLong, v, l)
      }),
      Gen.choose(1, 5)) { (vecs, k) =>
      // vectors must have a nonzero norm for cosine to be defined
      val rows = vecs.filter(_._2.exists(_ != 0f))
      (rows.size >= 3) ==> {
        import spark.implicits._
        val df = rows.toDF("vec_id", "embedding", "label")
        val probes = df.filter(col("vec_id") % 3 === 0)
        val corpus = df.filter(col("vec_id") % 3 =!= 0)
        val got = graft.operators.Similarity.knnClassify(probes, corpus, k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
        def cosR(a: Array[Float], b: Array[Float]): Double = {
          val dot = a.zip(b).map { case (x, y) =>
            math.floor(x.toDouble * y.toDouble * 1e9).toLong }.sum
          val na = a.map(x => math.floor(x.toDouble * x.toDouble * 1e9).toLong).sum
          val nb = b.map(y => math.floor(y.toDouble * y.toDouble * 1e9).toLong).sum
          math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) * 1e6) / 1e6
        }
        val cor = rows.filter(_._1 % 3 != 0)
        val expected = rows.filter(_._1 % 3 == 0).flatMap { case (pid, pv, _) =>
          val nn = cor.filter(_._1 != pid)
            .map { case (nid, nv, nl) => (nid, nl.toLong, cosR(pv, nv)) }
            .sortBy { case (nid, _, c) => (-c, nid) }.take(k)
          if (nn.isEmpty) None else {
            val votes = nn.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
              .sortBy { case (l, v) => (-v, l) }
            Some((pid, votes.head._1, votes.head._2))
          }
        }.sorted
        Prop(got == expected) :| s"k=$k got=$got expected=$expected"
      }
    }

  property("importanceWeights equals the in-memory add-one ratio reference") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.map(d => (d._1, d._3)).toDF("doc_id", "text")
      val corpus = df.filter(col("doc_id") % 3 =!= 0)
      val target = df.filter(col("doc_id") % 3 === 0)
      val got = graft.operators.Curation.importanceWeights(corpus, target, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      def grams(t: String) = t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
      val cDocs = docs.filter(_._1 % 3 != 0).map(d => (d._1, grams(d._3)))
        .filter(_._2.nonEmpty)
      val tDf = docs.filter(_._1 % 3 == 0).flatMap(d => grams(d._3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cDf = cDocs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = cDocs.map { case (id, gs) =>
        val imp = gs.toSeq.map(g =>
          (tDf.getOrElse(g, 0L) + 1) * 1000000000000L / (cDf(g) + 1)).sum
        (id, gs.size.toLong, imp, imp / gs.size)
      }.sorted
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  private val genTokenDoc: Gen[(Long, String)] = for {
    id <- Gen.choose(1L, 1000L)
    n <- Gen.choose(1, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x9", "q"))
  } yield (id, toks.mkString(" "))

  property("overlapChunks matches the in-memory reference on random docs") =
    forAll(Gen.nonEmptyListOf(genTokenDoc), Gen.choose(2, 6), Gen.choose(1, 6)) {
      (docs0, c, s0) =>
      val s = math.min(s0, c) // stride <= chunk
      val docs = docs0.distinctBy(_._1)
      import spark.implicits._
      val df = docs.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
      val got = graft.operators.Curation.overlapChunks(df, c, s)
        .select(col("doc_id"), col("chunk_idx"), col("n_in_chunk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val expected = docs.flatMap { case (id, t) =>
        val n = t.split(" ").length
        val last = (math.max(n - c, 0) + s - 1) / s
        (0 to last).map(i => (id, i.toLong, math.min(c, n - i * s).toLong))
      }.sorted
      Prop(got == expected) :| s"c=$c s=$s got=${got.take(8)} expected=${expected.take(8)}"
    }

  property("resizePoolUnits matches the in-memory reference; n→n float resize is identity") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-1000000, 1000000).map(_ / 1000.0f)).map(_.toArray),
      Gen.choose(1, 10)) { (v, m) =>
      import spark.implicits._
      val df = Seq((1L, v)).toDF("id", "f")
      val gotUnits = graft.multimodal.BinaryMedia.resizePoolUnits(df, "f", m)
        .select(col("resized_units")).head.getSeq[Long](0).toSeq
      val n = v.length
      val units = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      val expected = (0 until m).map { i =>
        val s = i * n / m; val e = ((i + 1) * n + m - 1) / m
        math.floor(units.slice(s, e).sum.toDouble / (e - s)).toLong
      }
      val ident = graft.multimodal.BinaryMedia.resizeFeatures(df, "f", n)
        .select(col("resized")).head.getSeq[Float](0).toSeq
      Prop(gotUnits == expected && ident == v.toSeq) :|
        s"m=$m gotUnits=$gotUnits expected=$expected"
    }

  property("scrubNumbers: masked strings are digit-free, counts match reference") =
    forAll(Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 500L)
      parts <- Gen.listOfN(6, Gen.oneOf("ab", "12", "7", "x", "905", ".", ""))
    } yield (id, parts.mkString("")))) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      import spark.implicits._
      val df = rows.toDF("event_id", "props")
      val got = graft.operators.Curation.scrubNumbers(df, "props")
        .select(col("event_id"), col("masked"), col("n_masked"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
      val expected = rows.map { case (id, t) =>
        (id, t.replaceAll("[0-9]+", "<num>"), "[0-9]+".r.findAllIn(t).size.toLong)
      }.sorted
      Prop(got == expected && got.forall(!_._2.exists(_.isDigit))) :|
        s"got=${got.take(5)} expected=${expected.take(5)}"
    }

  property("skyline2D equals the quadratic dominance reference on random clouds") =
    forAll(Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 10000L)
      x <- Gen.choose(0L, 15L)
      y <- Gen.choose(0L, 15L)
    } yield (id, x, y))) { pts0 =>
      val pts = pts0.distinctBy(_._1)
      import spark.implicits._
      val got = graft.operators.Skyline
        .skyline2D(pts.toDF("id", "x", "y").repartition(3), "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, qx, qy) =>
          qx >= x && qy >= y && (qx > x || qy > y) }
      }.toSet
      Prop(got == expected) :| s"got=${got.take(5)} expected=${expected.take(5)}"
    }

  property("shardAssign conserves docs/tokens and equals the global-rank deal") =
    forAll(
      Gen.nonEmptyListOf(for {
        id <- Gen.choose(1L, 10000L)
        n <- Gen.choose(1, 40)
      } yield (id, (1 to n).map(i => s"t$i").mkString(" "))),
      Gen.choose(1, 9)) { (rows0, s) =>
      val rows = rows0.distinctBy(_._1)
      import spark.implicits._
      val docs = rows.map { case (id, t) => (id, "en", t) }
        .toDF("doc_id", "lang", "text")
      val got = graft.operators.Curation.shardAssign(docs.repartition(3), s)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val ranked = rows.map { case (id, t) =>
        (id, t.split(" ").length.toLong) }.sortBy { case (id, n) => (-n, id) }
      val expected = ranked.zipWithIndex
        .map { case ((_, n), i) => (i.toLong % s, n) }
        .groupBy(_._1).map { case (sh, g) =>
          (sh, g.size.toLong, g.map(_._2).sum) }.toSeq.sorted
      Prop(got == expected) :| s"s=$s got=$got expected=$expected"
    }

  property("shardDealIncremental: random two-batch folds conserve docs and match the reference deal") =
    forAll(
      Gen.nonEmptyListOf(for {
        id <- Gen.choose(1L, 10000L)
        n <- Gen.choose(1, 40)
      } yield (id, (1 to n).map(i => s"t$i").mkString(" "))),
      Gen.choose(1, 6)) { (rows0, s) =>
      val rows = rows0.distinctBy(_._1)
      import spark.implicits._
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      def df(rs: List[(Long, String)]) =
        rs.map { case (id, t) => (id, t) }.toDF("doc_id", "text").repartition(3)
      val emptyAssign = Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_tok", "shard")
      val a1 =
        if (b1.isEmpty) emptyAssign
        else graft.operators.Curation.shardDealIncremental(emptyAssign, df(b1), s)
          .localCheckpoint(true)
      val a2 =
        if (b2.isEmpty) emptyAssign
        else graft.operators.Curation.shardDealIncremental(a1, df(b2), s)
      val all = a1.unionByName(a2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // conservation: every doc dealt exactly once onto a real shard
      val conserved = all.map(_._1).toSet == rows.map(_._1).toSet &&
        all.length == rows.size && all.forall(x => x._3 >= 0 && x._3 < s)
      // reference: batch-1 deal = rank mod s; batch-2 deal = rank r goes to
      // the shard at position (r-1) mod s of the load-ascending order
      def rank(rs: List[(Long, String)]) =
        rs.map { case (id, t) => (id, t.split(" ").length.toLong) }
          .sortBy { case (id, n) => (-n, id) }
      val exp1 = rank(b1).zipWithIndex.map { case ((id, n), i) => (id, n, i.toLong % s) }
      val loads = (0L until s.toLong).map(sh =>
        sh -> exp1.filter(_._3 == sh).map(_._2).sum).toMap
      val order = (0L until s.toLong).sortBy(sh => (loads(sh), sh))
      val exp2 = rank(b2).zipWithIndex.map { case ((id, n), i) => (id, n, order(i % s)) }
      val expected = (exp1 ++ exp2).toSet
      Prop(conserved && all.toSet == expected) :|
        s"s=$s got=${all.toSet.take(5)} expected=${expected.take(5)}"
    }

  property("custom as-of exec equals the driver-side reference on random keyed streams") =
    forAll(
      Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 6L); t <- Gen.choose(0L, 30L)
      } yield (k, t)),
      Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 6L); t <- Gen.choose(0L, 30L)
      } yield (k, t))) { (ls0, rs0) =>
      import spark.implicits._
      val ls = ls0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = rs0.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }
      val got = graft.plans.AsofJoin.asof(
          ls.toDF("k", "t", "lid").repartition(3),
          rs.toDF("k", "t", "rid").repartition(2))
        .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
      val expected = ls.flatMap { case (k, t, lid) =>
        val c = rs.filter(r => r._1 == k && r._2 <= t)
        if (c.isEmpty) None else Some((lid, c.maxBy(r => (r._2, r._3))._3))
      }.toSet
      Prop(got == expected) :| s"got=${got.take(5)} expected=${expected.take(5)}"
    }

  property("saltedSumCount equals the direct aggregation for any salt count") =
    forAll(
      Gen.nonEmptyListOf(for {
        k <- Gen.oneOf("a", "b", "c", "hot")
        v <- Gen.choose(0, 1000000).map(_ / 100.0)
      } yield (k, v)),
      Gen.choose(1, 8)) { (rows, buckets) =>
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val got = graft.operators.Salting.saltedSumCount(df, col("k"), col("v"), buckets)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
      val expected = df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
             sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
      Prop(got == expected) :| s"buckets=$buckets got=$got expected=$expected"
    }
}
