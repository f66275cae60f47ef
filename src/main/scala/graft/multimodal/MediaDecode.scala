package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed batch-decode plumbing for multimodal columns: the `mapPartitions`
  * seam where a real decoder (image/audio/video native lib) plugs in.
  *
  * The expression-level features live in `operators.Multimodal` (fully
  * oracle-checked); this path exists for decoders that need imperative
  * per-batch work — loading a codec once per partition, reusing scratch
  * buffers across rows — which no SQL expression can express. The decode
  * itself is STUBBED with a deterministic fake ([[decodeStub]]): the
  * image/audio libraries are not in this container. Swap [[decodeStub]]'s
  * body for the JNI/FFI call; every schema, partitioning, and batching
  * decision around it is real and tested.
  */
object MediaDecode {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_kind: Int)
  final case class MediaFeatures(
      doc_id: Long, media_kind: Int, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB — deterministic fake decode standing in for a real codec call
    * (`???` boundary). Reads the payload like a decoder would (full pass →
    * checksum) and derives fake dimensions from the byte length, mirroring
    * `operators.Multimodal.fakeDecode`. */
  private[multimodal] def decodeStub(m: MediaRow): MediaFeatures = {
    var crc = 0L
    var i = 0
    while (i < m.media.length) { crc = crc * 31 + (m.media(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = m.doc_id,
      media_kind = m.media_kind,
      n_bytes = m.media.length,
      width = m.media.length % 640,
      height = (m.media.length * 7) % 480,
      n_frames = m.media.length % 10 + 1,
      checksum = crc)
  }

  /** Partition-batched decode: one decoder context per partition (the
    * expensive-init line is marked), constant memory per row. Binary
    * payloads never shuffle — features are extracted where the bytes are. */
  def decode(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real decoder: initialize codec/context ONCE here, not per row
      rows.map(decodeStub)
    }
  }
}
