package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Multimodal column plumbing: media (image/audio/video) travels as an opaque
 * BINARY payload column with typed metadata, and feature extraction runs as
 * a batched per-partition map — the exact shape a real decoder (JPEG, PCM,
 * frame sampler) plugs into.
 *
 * The decode itself is a STUB: this container has no image/audio codecs, so
 * [[decodeImageStub]] derives deterministic fake dimensions/checksum from
 * the bytes. Everything AROUND the stub is real and tested: the binary
 * schema, the mapPartitions batching (fixed-size batches, the shape a
 * vectorized decoder wants), and the typed output schema.
 *
 * Scale: stateless narrow map; batch size bounds decoder memory; at 100 TB
 * the payload column should be stored in its own parquet column chunk
 * (column pruning keeps metadata-only queries from touching bytes).
 */
object MultimodalOps {

  /** Decoder batch size — bounds per-task decoder memory, and is the unit a
    * vectorized/native decoder would process at once. */
  val DecodeBatchSize = 64

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, checksum: Long, width: Int, height: Int)

  /** STUB image decode — deterministic fake: a real build would replace the
    * body with a codec call (e.g. TwelveMonkeys/JavaCV) and keep the
    * signature. Checksum is the same rolling polynomial as
    * [[graft.functions.TextHashOps.polyHash]] so the oracle can recompute it
    * from the source text (payload bytes are ASCII in the fixtures). */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var acc = 7L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val width = (acc % 640).toInt + 1
    val height = (acc % 480).toInt + 1
    (width, height, acc)
  }

  /** (doc_id, payload BINARY) -> typed features, decoding in fixed-size
    * batches per partition. */
  def extractImageFeatures(payloads: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call
        batch.iterator.map { case (id, bytes) =>
          val (w, h, ck) = decodeImageStub(bytes)
          MediaFeatures(id, bytes.length, ck, w, h)
        }
      }
    }
  }

  final case class ResizedFeatures(
      doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int, scale: Double)

  /** Resize planning: stub-decode each image and compute the aspect-
    * preserving fit into a `box`x`box` target (the normalization step in
    * front of any vision encoder). The geometry — scale factor and output
    * dims — is the real, tested logic; a codec build would add the pixel
    * resample to the same batched loop. Scale math is plain IEEE-double
    * min/floor so the oracle reproduces it bit-for-bit. */
  def resizePlan(payloads: Dataset[(Long, Array[Byte])], box: Int): Dataset[ResizedFeatures] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes) =>
          val (w, h, _) = decodeImageStub(bytes)
          val scale = math.min(box.toDouble / w, box.toDouble / h)
          val outW = math.max(1, math.floor(w * scale).toInt)
          val outH = math.max(1, math.floor(h * scale).toInt)
          ResizedFeatures(id, w, h, outW, outH, scale)
        }
      }
    }
  }

  /** Frame sampling over a "video" payload: the payload is a sequence of
    * fixed-`frameSize`-byte frames; emit every `stride`-th frame, at most
    * `maxFrames`, as (frame_idx, frame_offset, frame BINARY) rows. Pure
    * column-level explode — narrow, whole-stage codegen, no UDF — because
    * frame EXTRACTION is byte slicing; only frame DECODE (the stub) needs
    * the mapPartitions batch path above. Short payloads yield fewer (or
    * zero) frames, never a partial frame. */
  def sampleFrames(media: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int, stride: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      floor(length(col(payloadCol)) / frameSize).cast("int"),
      lit((maxFrames - 1) * stride + 1))
    val idxs = when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nFrames - 1, lit(stride)))
    media
      .withColumn("frame_idx", explode(idxs))
      .withColumn("frame_offset", col("frame_idx") * frameSize)
      .withColumn("frame", col(payloadCol).substr(col("frame_offset") + 1, lit(frameSize)))
      .select(col(idCol), col("frame_idx"), col("frame_offset"), col("frame"))
  }

  /** Overlapping-window chunking of an "audio" payload (window/hop in
    * bytes, the STFT input shape): emit (chunk_idx, chunk_offset,
    * chunk BINARY) for every full window. Same narrow-explode design as
    * [[sampleFrames]]. */
  def chunkAudio(media: DataFrame, idCol: String, payloadCol: String,
                 window: Int, hop: Int): DataFrame = {
    val nChunks = greatest(
      (floor((length(col(payloadCol)) - window) / hop) + 1).cast("int"), lit(0))
    val idxs = when(nChunks <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - 1))
    media
      .withColumn("chunk_idx", explode(idxs))
      .withColumn("chunk_offset", col("chunk_idx") * hop)
      .withColumn("chunk", col(payloadCol).substr(col("chunk_offset") + 1, lit(window)))
      .select(col(idCol), col("chunk_idx"), col("chunk_offset"), col("chunk"))
  }
}
