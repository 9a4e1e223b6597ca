package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata,
  * with a pluggable decode step.
  *
  * The Spark-side plumbing (schema, batch shape, partition-parallel decode
  * via mapPartitions over a typed Dataset) is real and tested; the actual
  * media decode is STUBBED — no image/audio libraries exist in this
  * container, so [[StubDecoder]] produces deterministic fake features from
  * the bytes. Swapping in a real decoder (JNI/FFmpeg/ImageIO) changes only
  * the [[Decoder]] instance: the decoder is instantiated once per PARTITION
  * (not per row), which is the shape an expensive native decoder needs.
  */
object BinaryMedia {

  /** Typed metadata carried beside every payload column. */
  case class MediaMeta(kind: String, nBytes: Long, contentId: String)

  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  case class FeatureRow(id: Long, features: Array[Float])

  /** Wrap a string column as a binary payload with metadata (stand-in for
    * reading real media files; the pattern is payload + sibling meta). */
  def asMedia(df: DataFrame, idCol: String, contentCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      col(contentCol).cast(BinaryType).as("payload"),
      struct(
        lit(kind).as("kind"),
        octet_length(col(contentCol).cast(BinaryType)).cast(LongType).as("nBytes"),
        sha2(col(contentCol).cast(BinaryType), 256).as("contentId")).as("meta"))

  /** Decode interface — constructed per partition. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decode: 8 features from the byte prefix + length.
    * Stands in for image decode / audio feature extraction. */
  object StubDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < 7) {
        out(i) = if (bytes.length > i) (bytes(i) & 0xff) / 255.0f else 0.0f
        i += 1
      }
      out(7) = bytes.length.toFloat
      out
    }
  }

  /** Partition-parallel feature extraction. Rows stream through the
    * decoder batch-wise per partition; no driver materialization. */
  def extractFeatures(media: Dataset[MediaRow],
                      mkDecoder: () => Decoder): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // once per partition, not per row
      rows.map(r => FeatureRow(r.id, decoder.decode(r.payload)))
    }
  }

  /** Adaptive average-pool resize of a feature vector to `targetLen`
    * (the "resize" verb of the multimodal surface: image thumbnails /
    * audio downsampling operate on decoded features exactly this way).
    * Bucket i covers source indices [floor(i·n/m), ceil((i+1)·n/m)) — the
    * standard adaptive-pooling bounds: every bucket is non-empty for n ≥ 1,
    * and the op handles both down- and up-sampling. Pure column ops
    * (codegen'd higher-order functions), zero shuffles, deterministic:
    * the fold order over each slice is the array order. */
  def resizeFeatures(df: DataFrame, featCol: String, targetLen: Int,
                     outCol: String = "resized"): DataFrame = {
    require(targetLen > 0, s"targetLen must be positive, got $targetLen")
    val n = s"size($featCol)"
    df.withColumn(outCol, expr(
      s"""case when $n = 0 then cast(array() as array<float>)
         |else transform(sequence(0, ${targetLen - 1}), i ->
         |  cast(aggregate(
         |    slice($featCol, i * $n div $targetLen + 1,
         |          ((i + 1) * $n + ${targetLen - 1}) div $targetLen - i * $n div $targetLen),
         |    cast(0.0 as double), (acc, x) -> acc + cast(x as double))
         |  / (((i + 1) * $n + ${targetLen - 1}) div $targetLen - i * $n div $targetLen)
         |  as float))
         |end""".stripMargin))
  }

  /** Oracle-exact integer-unit sibling of [[resizeFeatures]] (the x41
    * pattern): elements → floor(x·10⁶) unit integers, bucket value =
    * floor(unit_sum / bucket_len). Every intermediate is an exact-in-double
    * integer or a correctly-rounded IEEE op both engines compute
    * identically, so the result is hash-comparable against a DuckDB
    * replica — unlike the float path, whose per-slice fold order no
    * SQL oracle can promise to reproduce. Same bucket bounds as the
    * float path by construction. */
  def resizePoolUnits(df: DataFrame, featCol: String, targetLen: Int,
                      outCol: String = "resized_units"): DataFrame = {
    require(targetLen > 0, s"targetLen must be positive, got $targetLen")
    val n = s"size($featCol)"
    val units = s"transform($featCol, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"
    df.withColumn(outCol, expr(
      s"""case when $n = 0 then cast(array() as array<bigint>)
         |else transform(sequence(0, ${targetLen - 1}), i ->
         |  cast(floor(
         |    cast(aggregate(
         |      slice($units, i * $n div $targetLen + 1,
         |            ((i + 1) * $n + ${targetLen - 1}) div $targetLen - i * $n div $targetLen),
         |      0L, (acc, x) -> acc + x) as double)
         |    / (((i + 1) * $n + ${targetLen - 1}) div $targetLen - i * $n div $targetLen))
         |  as bigint))
         |end""".stripMargin))
  }

  /** "Frame sampling": fixed-stride byte-range slices of the payload —
    * the access pattern of video frame extraction, as pure column ops.
    * Emits exactly min(ceil(len/frameBytes), maxFrames) frames: no empty
    * trailing frame when len is an exact multiple, no frames for an empty
    * payload (sequence() would go descending for a 0..-1 range, hence the
    * explicit empty-payload branch). */
  def frameSample(df: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    // sequence(0, -1) would generate the DESCENDING [0, -1] and emit
    // garbage frames from negative substring offsets
    require(frameBytes > 0 && maxFrames > 0,
      s"frameBytes and maxFrames must be positive, got $frameBytes/$maxFrames")
    df.withColumn("frames", expr(
      s"""case when octet_length(payload) = 0 then cast(array() as array<binary>)
         |else transform(
         |  sequence(0, cast(least((octet_length(payload) + ${frameBytes - 1}) div $frameBytes, $maxFrames) as int) - 1),
         |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))
         |end""".stripMargin))
  }

  // ---- perceptual-hash near-duplicate mining ---------------------------

  /** dHash-style 63-bit perceptual fingerprint of a binary payload: the
    * first 64 bytes form the "pixel strip" (the decode stub's
    * deterministic stand-in for a resized grayscale grid — with a real
    * decoder the strip is the resized image, and ONLY this expression
    * changes), bit i = byte(i) > byte(i+1), MSB-first fold. 63 bits, not
    * 64: a 64-bit fold would overflow signed BIGINT arithmetic in the
    * oracle engine. Pure codegen'd column (substring/hex/conv under
    * transform+aggregate) — zero shuffle, scan-fused. */
  def dHash(payloadCol: String): Column = {
    val byteAt = (i: String) =>
      s"cast(conv(concat('0', hex(substring($payloadCol, $i, 1))), 16, 10) as bigint)"
    expr(
      s"""aggregate(
         |  transform(sequence(1, 63),
         |    i -> if(${byteAt("i")} > ${byteAt("i + 1")}, 1L, 0L)),
         |  0L, (acc, b) -> acc * 2 + b)""".stripMargin)
  }

  /** Perceptual-hash near-dup mining over binary payloads — image dedup's
    * shape with the stub strip ([[dHash]]): identical payloads collapse to
    * their min-id representative FIRST (the x21/x29 discipline — exact
    * dup groups never reach the pair stage), payloads shorter than the
    * 64-byte strip are refused as incomparable, then signatures band into
    * 3×21-bit LSH keys and only band-colliding pairs are verified by
    * Hamming distance ≤ `tau` (bit_count of XOR — one codegen'd op per
    * candidate). Sound subset semantics, like the banded cosine miner
    * x36: a true near-dup pair whose differing bits touch all three bands
    * is missed — the standard SimHash/LSH recall trade, raised by adding
    * bands, never by pairwise scans.
    *
    * Scale shape: one shuffle on (band_idx, band_value) whose hot keys
    * are bounded by rep-collapse; verify work ∝ distinct candidate
    * pairs. Returns (a_id, b_id, hamming), rep ids, a < b. */
  def phashNearDups(media: DataFrame, idCol: String, payloadCol: String,
                    tau: Int): DataFrame = {
    val d = media.select(col(idCol).as("mid"), col(payloadCol).as("payload"))
      .filter(octet_length(col("payload")) >= 64)
      .withColumn("h", sha2(col("payload"), 256))
    val reps = d.groupBy(col("h")).agg(min(col("mid")).as("rep_id"))
      .join(d, Seq("h"))
      .filter(col("mid") === col("rep_id"))
      .select(col("rep_id"), col("payload"))
    val sigs = reps.select(col("rep_id"), dHash("payload").as("sig"))
    val bands = sigs.select(col("rep_id"), col("sig"),
        explode(expr("sequence(0, 2)")).as("j"))
      .withColumn("band",
        expr("shiftright(sig, cast(21 * j as int))")
          .bitwiseAND(lit((1L << 21) - 1)))
    val a = bands.select(col("j"), col("band"),
      col("rep_id").as("a_id"), col("sig").as("a_sig"))
    val b = bands.select(col("j"), col("band"),
      col("rep_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("j", "band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("a_sig"), col("b_id"), col("b_sig"))
      .distinct() // verify once per distinct candidate pair
      .withColumn("hamming",
        expr("bit_count(a_sig ^ b_sig)").cast(LongType))
      .filter(col("hamming") <= tau)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
