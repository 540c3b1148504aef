package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.kg.SparkTestSession
import EventStreams._

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // keep event times well above the initial watermark (epoch 0): a row whose
  // event time equals the watermark is dropped as late
  private def ts(min: Long): Timestamp = new Timestamp((min + 10000) * 60000L)

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = windowedCounts(input.toDF(), "60 minutes", "120 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 5.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM wc").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally query.stop()
  }

  test("native session_window groups by gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionWindows(input.toDF(), "30 minutes", "10 hours")
      .writeStream.format("memory").queryName("sw")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "a", 1.0),
        Event(2, ts(10), 1, "a", 1.0), // same session (gap 10m)
        Event(3, ts(120), 1, "a", 1.0)) // new session (gap 110m)
      query.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM sw").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(rows.toSeq == Seq((1L, 1L), (1L, 2L)))
    } finally query.stop()
  }

  test("windowed HLL sketch: streamed registers equal the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = 12
    // minutes 10030..10049 all fall inside the single tumbling window
    // [10020, 10080) — the replay below assumes ONE window
    val batch1 = (1 to 60).map(i => Event(i, ts(i % 20 + 30), i % 40, "click", 1.0))
    val batch2 = (61 to 120).map(i => Event(i, ts(i % 20 + 30), i % 55, "click", 1.0))
    val input = MemoryStream[Event]
    // Complete mode: the memory sink holds exactly the final state per
    // window (Update mode would append one partial-sketch row per
    // micro-batch for the same window)
    val query = windowedDistinctSketch(input.toDF(), "60 minutes", "120 minutes", p)
      .writeStream.format("memory").queryName("hll")
      .outputMode(OutputMode.Complete()).start()
    try {
      // two micro-batches over the SAME window: the state-store merge
      // (element-wise max) must leave exactly the registers a single
      // batch pass over the union computes
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT regs FROM hll ORDER BY window.start DESC")
        .collect()(0).getSeq[Int](0)
      val exp = new Array[Int](1 << p)
      val hashes = (batch1 ++ batch2).map(_.user_id).toDF("k")
        .select(org.apache.spark.sql.functions.xxhash64($"k"))
        .collect().map(_.getLong(0))
      for (h <- hashes) {
        val bucket = (h & ((1 << p) - 1)).toInt
        val rest = h >>> p
        val rho = if (rest == 0L) 64 - p + 1
                  else java.lang.Long.numberOfLeadingZeros(rest) - p + 1
        if (rho > exp(bucket)) exp(bucket) = rho
      }
      assert(streamed.toArray.sameElements(exp),
        "streamed HLL state diverged from the batch register spec")
      // sanity: estimate lands near the true 55 distinct users
      val regs = streamed.zipWithIndex.collect {
        case (r, b) if r > 0 => (b.toLong, r.toLong)
      }
      val est = graft.ops.SketchOps.hllEstimate(regs.toSeq, p)
      assert(math.abs(est - 55.0) < 5.0, s"estimate $est vs 55")
    } finally query.stop()
  }

  test("windowed count-min sketch: streamed counters equal the batch table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (1 to 40).map(i => Event(i, ts(i % 20 + 30), i % 9, "c", 1.0))
    val batch2 = (41 to 90).map(i => Event(i, ts(i % 20 + 30), i % 13, "c", 1.0))
    val input = MemoryStream[Event]
    val query = windowedFrequencySketch(
        input.toDF(), "60 minutes", "120 minutes", depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT depth, bucket, n FROM cms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = graft.ops.SketchOps.countMinTable(
          (batch1 ++ batch2).map(_.user_id).toDF("user_id"), "user_id",
          depth = 4, width = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == expected,
        "streamed CMS counters diverged from the batch table")
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionization emits updates and closes on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = statefulSessions(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("ss")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "a", 1.0),
        Event(2, ts(5), 7, "a", 2.0))
      query.processAllAvailable()
      // same user far later: in-closure gap split closes the first session
      input.addData(Event(3, ts(200), 7, "a", 4.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT n_events, total_value, closed FROM ss")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      assert(rows.contains((2L, 3.0, false))) // open session after batch 1
      assert(rows.contains((2L, 3.0, true))) // closed by gap in batch 2
      assert(rows.contains((1L, 4.0, false))) // new open session
    } finally query.stop()
  }

  test("streaming dedup keeps first doc per fingerprint within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val deduped = streamingDedup(docs, "120 minutes")
    // documented contract: callers get the INPUT schema back — the internal
    // fp fingerprint column must not leak (round-7 ADVICE regression)
    assert(deduped.columns.toSeq == docs.columns.toSeq, deduped.columns.toSeq)
    val query = deduped
      .writeStream.format("memory").queryName("sd")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts(5), "the quick brown fox"),
        (2L, ts(6), "The QUICK, brown fox"), // same normalized fingerprint
        (3L, ts(7), "an entirely different document"))
      query.processAllAvailable()
      input.addData(
        (4L, ts(20), "the quick brown fox")) // duplicate inside watermark
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM sd").collect().map(_.getLong(0)).toSet
      assert(ids.contains(3L))
      // exactly one of the fox duplicates survives, and it is the first seen
      assert(ids.intersect(Set(1L, 2L, 4L)) == Set(1L), ids)
    } finally query.stop()
  }

  test("streaming triple extraction over a pages stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.kg.Model.Page]
    val query = streamingTriples(input.toDS())
      .writeStream.format("memory").queryName("st")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(graft.kg.PagesSource.genPage(0), graft.kg.PagesSource.genPage(1))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM st WHERE error IS NULL").count() > 0)
    } finally query.stop()
  }

  test("batch curation operators run unchanged on streams (MixOps, TextOps)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    // stratified sampling + PII scrub are narrow column plans, so the SAME
    // operator code is streaming-legal with no modification
    val curated = graft.ops.MixOps.stratifiedSample(
      input.toDF().toDF("doc_id", "source", "text"),
      org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("doc_id"),
      Map("keep" -> 1.0))
      .withColumn("scrubbed", graft.ops.TextOps.piiScrub(
        org.apache.spark.sql.functions.col("text")))
    val query = curated.writeStream.format("memory").queryName("cur")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "keep", "mail a@b.co"), (2L, "drop", "x"), (3L, "keep", "y"))
      query.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, scrubbed FROM cur").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "mail <EMAIL>"), (3L, "y")))
    } finally query.stop()
  }

  test("streaming as-of enrichment matches latest click, carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = streamingAsof(input.toDS(), horizonMs = 10 * 3600 * 1000L)
      .writeStream.format("memory").queryName("sa")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: click then purchase (same batch), purchase with no click
      input.addData(
        Event(100, ts(0), 1, "click", 0.0),
        Event(101, ts(5), 1, "click", 0.0),
        Event(102, ts(10), 1, "purchase", 9.0), // -> click 101 (latest)
        Event(200, ts(10), 2, "purchase", 5.0)) // -> no click: None
      query.processAllAvailable()
      // batch 2: state carries user 1's latest click; a newer click wins;
      // a LATE purchase older than the stored click must NOT match it
      input.addData(
        Event(103, ts(20), 1, "purchase", 1.0), // -> still click 101
        Event(104, ts(30), 1, "click", 0.0),
        Event(105, ts(31), 1, "purchase", 1.0), // -> click 104
        Event(300, ts(2), 2, "click", 0.0))
      query.processAllAvailable()
      // batch 3: user 2's purchase at ts(1) is OLDER than the stored click
      // at ts(2) -> no match (backward-inclusive, never forward)
      input.addData(Event(301, ts(1), 2, "purchase", 1.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT event_id, click_id, gap_ms FROM sa").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows == Set(
        (102L, 101L, 5 * 60000L),
        (200L, -1L, -1L),
        (103L, 101L, 15 * 60000L),
        (105L, 104L, 1 * 60000L),
        (301L, -1L, -1L)))
    } finally query.stop()
  }
}
