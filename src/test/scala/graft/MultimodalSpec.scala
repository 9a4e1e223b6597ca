package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.BinaryMedia

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  lazy val media = BinaryMedia.asMedia(
    Tables.t(spark, sf, "documents").limit(50), "doc_id", "text", "text/plain")

  test("payload schema: binary + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "nBytes", "contentId"))
  }

  test("phashNearDups: planted near-dup found at its bit distance; exact dups collapse; shorts refused") {
    import spark.implicits._
    val base = (0 until 64).map(i => ('a' + (i % 26)).toChar).mkString
    // one byte changed mid-strip flips at most its two adjacent dHash bits
    val nearDup = base.updated(30, 'z')
    val unrelated = (0 until 64).map(i => ('a' + ((i * 17 + 5) % 26)).toChar).mkString
    val rows = Seq(
      (1L, base), (2L, base),       // exact dups: collapse to rep 1
      (3L, nearDup),
      (4L, unrelated),
      (5L, "short")                  // < 64 bytes: refused
    ).toDF("doc_id", "text").withColumn("payload", col("text").cast("binary"))
    val pairs = BinaryMedia.phashNearDups(rows, "doc_id", "payload", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the planted pair survives with hamming <= 2; no pair touches the
    // duplicate id 2 (rep-collapse) or the short id 5 (refused)
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h <= 2 })
    assert(pairs.forall { case (a, b, _) => a != 2L && b != 2L && a != 5L && b != 5L })
    // signatures are partitioning-independent
    val s1 = rows.filter($"doc_id" === 1L).select(BinaryMedia.dHash("payload")).head().getLong(0)
    val s2 = rows.repartition(7).filter($"doc_id" === 2L)
      .select(BinaryMedia.dHash("payload")).head().getLong(0)
    assert(s1 == s2 && s1 > 0L)
  }

  test("stub decode: partition-parallel, deterministic, batch-shaped") {
    import spark.implicits._
    val ds = media.as[BinaryMedia.MediaRow]
    val f1 = BinaryMedia.extractFeatures(ds, () => BinaryMedia.StubDecoder)
      .collect().map(r => r.id -> r.features.toSeq).toMap
    val f2 = BinaryMedia.extractFeatures(ds.repartition(7), () => BinaryMedia.StubDecoder)
      .collect().map(r => r.id -> r.features.toSeq).toMap
    assert(f1 == f2) // partitioning must not change features
    assert(f1.values.forall(_.length == 8))
  }

  test("frame sampling slices payload at fixed stride") {
    val withFrames = BinaryMedia.frameSample(media, frameBytes = 16, maxFrames = 4)
    val r = withFrames.select(col("frames"), octet_length(col("payload"))).limit(5).collect()
    r.foreach { row =>
      val frames = row.getSeq[Array[Byte]](0)
      val len = row.getInt(1)
      assert(frames.length == math.min((len + 15) / 16, 4))
      assert(frames.forall(_.length > 0))       // never an empty trailing frame
      assert(frames.init.forall(_.length == 16))
    }
  }

  test("resize: adaptive average-pool downsamples to pairwise means") {
    import spark.implicits._
    val df = Seq((1L, Array(2.0f, 4.0f, 6.0f, 8.0f, 1.0f, 3.0f, 5.0f, 7.0f)))
      .toDF("id", "f")
    val got = BinaryMedia.resizeFeatures(df, "f", 4)
      .select("resized").head.getSeq[Float](0)
    assert(got == Seq(3.0f, 7.0f, 2.0f, 6.0f)) // 8→4: means of adjacent pairs
  }

  test("resize: n→n is identity; upsample replicates; empty stays empty") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.5f, -2.5f, 3.5f)),
      (2L, Array(9.0f, 11.0f)),
      (3L, Array.empty[Float])).toDF("id", "f")
    val same = BinaryMedia.resizeFeatures(df.filter($"id" === 1), "f", 3)
      .select("resized").head.getSeq[Float](0)
    assert(same == Seq(1.5f, -2.5f, 3.5f))
    val up = BinaryMedia.resizeFeatures(df.filter($"id" === 2), "f", 4)
      .select("resized").head.getSeq[Float](0)
    assert(up == Seq(9.0f, 9.0f, 11.0f, 11.0f)) // 2→4: each source covers 2 buckets
    val empty = BinaryMedia.resizeFeatures(df.filter($"id" === 3), "f", 4)
      .select("resized").head.getSeq[Float](0)
    assert(empty.isEmpty)
  }

  test("resize units sibling: same buckets, floor-div pooling, negative-safe") {
    import spark.implicits._
    // -0.35 → floor(-350000.5)... units are floor(x·1e6): exact halves chosen
    val df = Seq((1L, Array(0.25f, 0.75f, -0.25f, -0.75f))).toDF("id", "f")
    val got = BinaryMedia.resizePoolUnits(df, "f", 2)
      .select("resized_units").head.getSeq[Long](0)
    // bucket sums: (250000+750000)=1000000, (-250000+-750000)=-1000000
    assert(got == Seq(500000L, -500000L))
    // floor-div on a NEGATIVE odd sum rounds toward -inf in both engines
    val odd = Seq((1L, Array(-0.25f, -0.75f, -0.25f))).toDF("id", "f")
    val g2 = BinaryMedia.resizePoolUnits(odd, "f", 1)
      .select("resized_units").head.getSeq[Long](0)
    assert(g2 == Seq(-416667L)) // floor(-1250000/3) = -416667, not -416666
  }

  test("resize: uneven 64→12 buckets partition the source exactly") {
    import spark.implicits._
    // With ones everywhere, every bucket mean is 1 regardless of length —
    // but the UNITS sibling exposes bucket lengths via a ramp input.
    val ramp = (0 until 64).map(_.toFloat).toArray
    val df = Seq((1L, ramp)).toDF("id", "f")
    val got = BinaryMedia.resizeFeatures(df, "f", 12)
      .select("resized").head.getSeq[Float](0)
    assert(got.length == 12)
    // bucket i covers [floor(i*64/12), ceil((i+1)*64/12)): verify directly
    val expect = (0 until 12).map { i =>
      val s = i * 64 / 12
      val e = ((i + 1) * 64 + 11) / 12
      (s until e).map(_.toDouble).sum / (e - s)
    }
    got.zip(expect).foreach { case (g, x) => assert(math.abs(g - x) < 1e-4) }
  }

  test("frame count is ceil(len/frameBytes): exact multiples and empty payloads") {
    import spark.implicits._
    val df = Seq(("a" * 32, 1L), ("b" * 33, 2L), ("c" * 31, 3L), ("", 4L), ("d" * 100, 5L))
      .toDF("text", "doc_id")
    val media = BinaryMedia.asMedia(df, "doc_id", "text", "text/plain")
    val got = BinaryMedia.frameSample(media, frameBytes = 16, maxFrames = 4)
      .select(col("id"), col("frames")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1).map(_.length)).toMap
    assert(got(1L) == Seq(16, 16))          // exact multiple: no empty 3rd frame
    assert(got(2L) == Seq(16, 16, 1))       // remainder → short last frame
    assert(got(3L) == Seq(16, 15))
    assert(got(4L) == Seq())                // empty payload → zero frames
    assert(got(5L) == Seq(16, 16, 16, 16))  // capped at maxFrames
  }
}
