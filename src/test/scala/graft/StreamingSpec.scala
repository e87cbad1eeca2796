package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming spec: the streaming flavor of the windowed
  * aggregate must produce exactly the batch result when drained with
  * an available-now trigger into a memory sink. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed agg equals batch windowed agg") {
    val batch = SparkEntry.queries("evt1_window_agg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDecimal(3)))
      .toSet
    // stage the events file into a directory (file sources tail dirs)
    val dir = java.nio.file.Files.createTempDirectory("evt_stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.streamingWindowedAgg(spark, sf, dir.toString)
      .writeStream
      .format("memory")
      .queryName("evt_stream_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM evt_stream_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDecimal(3)))
      .toSet
    q.stop()
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("sessionization counts are sane") {
    val rows = SparkEntry.queries("evt3_sessions")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getLong(1) >= 1))
  }
}
