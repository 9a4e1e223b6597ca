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
    val r = withFrames.select(col("frames")).limit(5).collect()
    r.foreach { row =>
      val frames = row.getSeq[Array[Byte]](0)
      assert(frames.nonEmpty && frames.length <= 4)
      assert(frames.init.forall(_.length == 16))
    }
  }
}
