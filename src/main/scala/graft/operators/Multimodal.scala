package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata. The testdata has no real image/audio bytes, so media is
  * synthesized deterministically (`encode(text, 'UTF-8')`) and the decode
  * step is a clearly-marked deterministic fake ([[fakeDecode]]) — the
  * Spark-side plumbing (binary column, per-batch feature extraction, schema)
  * is real and oracle-checked.
  *
  * Real deployment note: swap [[fakeDecode]] for a `mapPartitions` batch
  * decoder (JNI/FFI image lib) over the same binary column; everything
  * upstream/downstream is unchanged. Binary payloads stay off the shuffle
  * path — features are extracted map-side and only the (small) feature
  * columns move.
  */
object Multimodal {

  /** documents → (doc_id, media binary, media_kind). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        (col("doc_id") % 3).cast("int").as("media_kind")) // 0=image,1=audio,2=video stand-ins

  /** Deterministic fake decode: byte length, 4-byte header hex, content
    * digest, and fake width/height/frame metadata derived from the payload
    * size. A real decoder replaces exactly these three columns. */
  def fakeDecode(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_kind"),
      length(col("media")).as("n_bytes"),
      lower(hex(substring(col("media"), 1, 4))).as("header_hex"),
      md5(col("media")).as("content_md5"),
      (length(col("media")) % 640).as("width"),
      ((length(col("media")) * 7) % 480).as("height"),
      ((length(col("media")) % 10) + 1).as("n_frames"))

  def features(spark: SparkSession, dir: String): DataFrame =
    fakeDecode(mediaTable(spark, dir))

  /** Oracle operates on the text bytes directly (DuckDB lacks blob
    * substring/md5); the payload is UTF-8 of ASCII text, so byte and char
    * slices coincide. */
  val featuresSql: String =
    """SELECT doc_id,
      |       CAST(doc_id % 3 AS INTEGER) AS media_kind,
      |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |       lower(hex(substr(text, 1, 4))) AS header_hex,
      |       md5(text) AS content_md5,
      |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      |       CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
      |       CAST(octet_length(encode(text)) % 10 + 1 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("mm_features", features(_, _).orderBy("doc_id"), Some(featuresSql)))
}
