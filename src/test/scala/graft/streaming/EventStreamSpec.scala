package graft.streaming

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming correctness against the batch oracle: the same declarative
  * transform over the same rows must produce identical results whether
  * executed incrementally (file-source stream, append mode after
  * watermark close) or as one batch.
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val srcDir: String = {
    // µs-converted copy of the events table as the stream's source drop
    val dir = Files.createTempDirectory("graft_stream").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(s"$dir/drop")
    s"$dir/drop"
  }

  test("windowed counts: streaming result matches the batch computation") {
    val streamed = EventStream.runToMemory(spark, srcDir, "win_counts",
      df => EventStream.windowedCounts(df))
    val batch = EventStream.windowedCounts(
      spark.read.schema(EventStream.schema).parquet(srcDir))

    // append mode only emits windows closed by the watermark; the final
    // in-flight windows stay in state. Compare on the emitted subset.
    val s = streamed.orderBy($"window_start", $"event_type")
      .collect().map(_.toSeq)
    val maxEmitted = streamed.agg(max($"window_start")).collect()(0).getTimestamp(0)
    val b = batch.filter($"window_start" <= maxEmitted)
      .orderBy($"window_start", $"event_type")
      .collect().map(_.toSeq)
    assert(s.nonEmpty)
    assert(s.toSeq == b.toSeq)
  }

  test("stateful sessionization (flatMapGroupsWithState) matches session_window on closed sessions") {
    import org.apache.spark.sql.Dataset
    val src = spark.readStream.schema(EventStream.schema).parquet(srcDir)
    val typed: Dataset[EventStream.Event] = src
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event]
    val q = EventStream.sessionizeStateful(typed)
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_sessions").start()
    q.processAllAvailable(); q.stop()
    val stateful = spark.table("stateful_sessions")

    // batch oracle: session_window over the same rows
    val batch = EventStream.sessionize(
      spark.read.schema(EventStream.schema).parquet(srcDir))
    // compare the sessions the stateful variant closed (open sessions
    // stay in state; session_window end = last+gap, stateful end = last)
    val sRows = stateful
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(_.toSeq).toSet
    val bRows = batch
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(_.toSeq).toSet
    assert(sRows.nonEmpty)
    assert(sRows.subsetOf(bRows),
      s"stateful emitted sessions not in batch oracle: ${(sRows -- bRows).take(3)}")
  }

  test("foreachBatch parquet sink: checkpointed write lands every closed window") {
    val out = Files.createTempDirectory("graft_fes").toString
    EventStream.runToParquet(spark, srcDir, s"$out/data", s"$out/ckpt",
      df => EventStream.windowedCounts(df))
    val landed = EventStream.readSink(spark, s"$out/data")
    val emitted = EventStream.runToMemory(spark, srcDir, "fes_mem",
      df => EventStream.windowedCounts(df))
    assert(landed.count() == emitted.count())
  }

  test("foreachBatch parquet sink is idempotent on batch replay") {
    val out = Files.createTempDirectory("graft_fes_replay").toString
    EventStream.runToParquet(spark, srcDir, s"$out/data", s"$out/ckpt1",
      df => EventStream.windowedCounts(df))
    val first = EventStream.readSink(spark, s"$out/data").count()
    // Fresh checkpoint + same source ⇒ Structured Streaming re-delivers
    // every micro-batch (the worst-case replay). The batchId-keyed
    // overwrite must land on the same paths, not append duplicates.
    EventStream.runToParquet(spark, srcDir, s"$out/data", s"$out/ckpt2",
      df => EventStream.windowedCounts(df))
    val second = EventStream.readSink(spark, s"$out/data").count()
    assert(first > 0)
    assert(second == first, s"replay duplicated rows: $first -> $second")
  }

  test("streaming dedup: redelivered events collapse to one row each") {
    // double-deliver the whole source (worst-case at-least-once replay)
    val dupDir = Files.createTempDirectory("graft_dup").toString
    val src = spark.read.schema(EventStream.schema).parquet(srcDir)
    src.unionAll(src).write.mode("overwrite").parquet(s"$dupDir/drop")
    val deduped = EventStream.runToMemory(spark, s"$dupDir/drop", "dedup",
      df => EventStream.dedupe(df))
    val distinct = src.select($"event_id").distinct().count()
    assert(deduped.count() == distinct,
      s"expected $distinct unique events, got ${deduped.count()}")
  }

  test("stream-stream interval join matches the batch join on emitted rows") {
    val streamed = EventStream.runToMemory(spark, srcDir, "attrib",
      df => EventStream.purchaseAttribution(df))
    val batch = EventStream.purchaseAttribution(
      spark.read.schema(EventStream.schema).parquet(srcDir))
    val sRows = streamed.collect().map(_.toSeq).toSet
    val bRows = batch.collect().map(_.toSeq).toSet
    assert(sRows.nonEmpty)
    // append mode may hold back pairs the watermark hasn't sealed yet —
    // everything emitted must be a true batch pair
    assert(sRows.subsetOf(bRows),
      s"streamed pairs missing from batch oracle: ${(sRows -- bRows).take(3)}")
    // and the join must not be trivially empty relative to batch
    assert(sRows.size >= bRows.size / 2)
  }

  test("sessionization: gap-based session windows per user") {
    val sessions = EventStream.runToMemory(spark, srcDir, "sessions",
      df => EventStream.sessionize(df, gap = "30 minutes"))
    assert(sessions.count() > 0)
    // session invariant: end - start >= 0 and every session has events
    assert(sessions.filter($"session_end" < $"session_start").count() == 0)
    assert(sessions.filter($"n_events" <= 0).count() == 0)
    // batch equivalence on the emitted subset
    val batch = EventStream.sessionize(
      spark.read.schema(EventStream.schema).parquet(srcDir))
    val emitted = sessions.count()
    val total = batch.count()
    assert(emitted <= total)
  }
}
