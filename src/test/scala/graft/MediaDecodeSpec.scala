package graft

import graft.multimodal.MediaDecode
import graft.multimodal.MediaDecode.MediaRow
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaDecodeSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("mapPartitions decode agrees with the expression-level fake decode") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, TestSpark.Sf0001)
      .as[MediaRow]
    val typed = MediaDecode.decode(media).collect()
      .map(f => f.doc_id -> (f.n_bytes, f.width, f.height, f.n_frames)).toMap
    val expr = Multimodal.features(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"), col("n_frames"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(typed == expr)
    assert(typed.nonEmpty)
  }

  test("decode is deterministic and checksums differ across differing payloads") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, TestSpark.Sf0001).as[MediaRow].limit(20)
    val a = MediaDecode.decode(media).collect().sortBy(_.doc_id).map(_.checksum).toSeq
    val b = MediaDecode.decode(media).collect().sortBy(_.doc_id).map(_.checksum).toSeq
    assert(a == b)
    assert(a.distinct.size > 1)
  }
}
