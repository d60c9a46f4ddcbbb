package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")

  test("asMedia produces (id long, payload binary)") {
    assert(media.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("id", "long"), ("payload", "binary")))
  }

  test("decodeMeta (mapPartitions stub) agrees with its SQL twin row-for-row") {
    val typed = Multimodal.decodeMeta(media).toDF()
    val sql   = Multimodal.decodeMetaSql(media)
    val t = typed.orderBy("id").collect().map(_.toSeq).toSeq
    val s = sql.orderBy("id").collect().map(_.toSeq).toSeq
    assert(t === s)
  }

  test("decode handles empty payloads without error") {
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.asMedia(empty, "doc_id", "text")).collect()
    assert(meta.head.byteLen === 0)
    assert(meta.head.width === 1 && meta.head.height === 1)
  }

  test("frame sampling emits every stride-th frame with stable hashes") {
    val frames = Multimodal.sampleFrames(media, stride = 4, frameBytes = 16)
    assert(frames.filter($"frame_no" % 4 =!= 0).count() === 0)
    val again = Multimodal.sampleFrames(media, stride = 4, frameBytes = 16)
    assert(frames.exceptAll(again).count() === 0)
  }
}
