package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Store
import graft.streaming.StreamingHistorization

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming agg over a file stream matches the batch twin") {
    val batch = graft.sources.Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft-stream").toString
    batch.write.parquet(s"$dir/in")

    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
    val agg = StreamingHistorization.windowedEventAgg(stream, windowLen = "60 minutes")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("winagg")
      .select(col("window").getField("start").as("ws"), col("event_type"), col("n_events"))
    val expected = batch.groupBy(window(col("ts"), "60 minutes").getField("start").as("ws"),
        col("event_type")).agg(count(lit(1)).as("n_events"))
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }

  test("foreachBatch historization absorbs re-delivered snapshots idempotently") {
    val dir = Files.createTempDirectory("graft-stream-hist").toString
    val snap = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    snap.write.parquet(s"$dir/in/batch0")
    // re-deliver the same content as a second file drop
    snap.write.mode("append").parquet(s"$dir/in/batch1")

    val stream = spark.readStream.schema(snap.schema).parquet(s"$dir/in/*")
    val writer = StreamingHistorization.historizeStream(
      stream, s"$dir/store", Seq("k"), s"$dir/chk")
    StreamingHistorization.runOnce(writer)

    val store = Store.readParquetSafe(spark, s"$dir/store").get
    assert(store.count() === 2) // duplicates absorbed by the hash anti-join
  }
}
