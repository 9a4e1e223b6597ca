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
