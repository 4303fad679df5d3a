package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.EventEnvelope
import graft.operators.{Reads, Redaction}
import graft.sources.{EventLogStore, PendingEvent}

/** IsRedacted semantics (PrepareFlags.IsRedacted = 0x200 —
  * PrepareLogRecord.cs:30): redact rewrites the payload at rest, every
  * reader returns empty data for flagged events (PrepareLogRecord.cs:65)
  * and surfaces the flag (Convert.cs:349), envelope intact. */
class RedactionSpec extends SparkTestBase {

  private def freshStore(buckets: Int = 0): EventLogStore =
    new EventLogStore(spark, Files.createTempDirectory("graftredact").toString,
      requestedBuckets = buckets)

  private def pe(stream: String, id: String, data: String): PendingEvent =
    PendingEvent(stream, id, "E", data, metadata = s"""{"m":"$id"}""",
      correlation_id = "c-" + id)

  test("redact blanks data and sets the flag; envelope intact") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1", """{"secret":1}"""),
      pe("a-1", "e2", """{"secret":2}"""), pe("b-1", "e3", """{"ok":3}""")))
    assert(store.redact("a-1", 1L) == 1L)
    val rows = store.read().orderBy("log_position")
      .select("stream_id", "event_number", "event_type", "event_id",
        "correlation_id", "metadata", "data", "is_redacted").collect()
    val redacted = rows.find(r => r.getString(0) == "a-1" && r.getLong(1) == 1L).get
    assert(redacted.getBoolean(7), "flag must be set")
    assert(redacted.getString(6) == "", "data must be scrubbed")
    // envelope intact (PrepareLogRecord keeps everything but Data)
    assert(redacted.getString(2) == "E")
    assert(redacted.getString(3) == "e2")
    assert(redacted.getString(4) == "c-e2")
    assert(redacted.getString(5) == """{"m":"e2"}""")
    // neighbors untouched
    assert(rows.count(_.getBoolean(7)) == 1)
    assert(rows.find(r => r.getString(0) == "a-1" && r.getLong(1) == 0L)
      .get.getString(6) == """{"secret":1}""")
  }

  test("redaction is physical: the payload bytes are gone at rest") {
    val store = freshStore()
    val dir = Files.createTempDirectory("graftredact2").toString
    val s2 = new EventLogStore(spark, dir)
    s2.append(Seq(pe("a-1", "e1", """{"secret":"payload"}""")))
    assert(s2.redact("a-1", 0L) == 1L)
    // raw parquet, no scrub in the way: the bytes must not be on disk
    val raw = spark.read.parquet(s"$dir/log")
      .select("data", "is_redacted").collect()
    assert(raw.forall(r => r.getString(0) == "" && r.getBoolean(1)))
  }

  test("redact of a missing event is a no-op returning 0") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1", "{}")))
    assert(store.redact("a-1", 5L) == 0L)
    assert(store.redact("nope-1", 0L) == 0L)
  }

  test("redact prunes to the stream's bucket on a bucketed log") {
    val store = freshStore(buckets = 4)
    store.append(Seq(pe("a-1", "e1", """{"x":1}"""), pe("b-1", "e2", """{"x":2}"""),
      pe("c-1", "e3", """{"x":3}""")))
    assert(store.redact("b-1", 0L) == 1L)
    val rows = store.read().select("stream_id", "data", "is_redacted").collect()
    assert(rows.find(_.getString(0) == "b-1").get.getString(1) == "")
    assert(rows.filter(_.getString(0) != "b-1").forall(r =>
      r.getString(1).nonEmpty && !r.getBoolean(2)))
  }

  test("every batch reader scrubs a flag-only frame (defense in depth)") {
    import spark.implicits._
    // flag set but payload still present — e.g. an externally written log;
    // the flag must win at read (PrepareLogRecord.cs:65)
    val log = Seq(
      ("s-1", 0L, "id0", "E", new java.sql.Timestamp(0), 0L, null.asInstanceOf[String], true, """{"leak":1}""", null.asInstanceOf[String], true),
      ("s-1", 1L, "id1", "E", new java.sql.Timestamp(1), 1L, null.asInstanceOf[String], true, """{"ok":2}""", null.asInstanceOf[String], false)
    ).toDF("stream_id", "event_number", "event_id", "event_type", "timestamp",
      "log_position", "correlation_id", "is_json", "data", "metadata", "is_redacted")
    def dataOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.select("event_number", "data").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val expected = Seq(0L -> "", 1L -> """{"ok":2}""")
    assert(dataOf(Reads.readStreamForwards(log, "s-1")) == expected)
    assert(dataOf(Reads.readStreamBackwards(log, "s-1")) == expected)
    assert(dataOf(Reads.readAllForwards(log)) == expected)
    assert(dataOf(Reads.readAllBackwards(log)) == expected)
    // a frame without the column passes through untouched, schema unchanged
    val plain = log.drop("is_redacted")
    assert(Redaction.scrub(plain).schema == plain.schema)
    assert(dataOf(Reads.readStreamForwards(plain, "s-1")) ==
      Seq(0L -> """{"leak":1}""", 1L -> """{"ok":2}"""))
  }

  test("projections fold redacted events with empty data") {
    import spark.implicits._
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1", """{"n":10}"""), pe("a-1", "e2", """{"n":32}""")))
    store.redact("a-1", 0L)
    // a JS projection summing the body field sees 0 for the redacted event
    val p = graft.projections.js.JsProjection.compile(
      """fromStream('a-1').when({
        |  $init: function() { return { sum: 0 }; },
        |  E: function(s, e) { s.sum += (e.body && e.body.n) ? e.body.n : 0; return s; }
        |})""".stripMargin)
    val out = p.states(store.read()).collect()
    assert(out.length == 1)
    assert(out.head.getString(1).contains("\"sum\":32"))
  }

  test("scavenge and compact preserve redaction") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1", """{"secret":1}"""), pe("a-1", "e2", """{"x":2}""")))
    store.redact("a-1", 0L)
    store.compact(maxFilesPerPartition = 0)
    val afterCompact = store.read().orderBy("event_number")
      .select("data", "is_redacted").collect()
    assert(afterCompact.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("", true), ("""{"x":2}""", false)))
    store.scavenge()
    val afterScavenge = store.read().orderBy("event_number")
      .select("data", "is_redacted").collect()
    assert(afterScavenge.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("", true), ("""{"x":2}""", false)))
  }

  test("streaming subscriptions scrub redacted events (SUB2 reader)") {
    val dir = Files.createTempDirectory("graftredactsub").toString
    val store = new EventLogStore(spark, dir)
    store.append(Seq(pe("a-1", "e1", """{"secret":1}"""), pe("a-1", "e2", """{"ok":2}""")))
    store.redact("a-1", 0L)
    val q = graft.streaming.Subscriptions.subscribeAll(spark, s"$dir/log")
      .writeStream.format("memory").queryName("redactsub")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
        "SELECT event_number, data, is_redacted FROM redactsub ORDER BY event_number")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(rows == Seq((0L, "", true), (1L, """{"ok":2}""", false)))
  }

  test("subscribeAll filters see SCRUBBED data, like the batch readers") {
    import spark.implicits._
    // flag set but payload still on disk (externally written log): a
    // data-referencing subscription filter must not match the redacted
    // payload — scrub runs before the caller's predicate
    val dir = Files.createTempDirectory("graftredactflt").toString
    Seq(
      ("s-1", 0L, "id0", "E", new java.sql.Timestamp(0), 0L,
        null.asInstanceOf[String], true, """{"secret":1}""",
        null.asInstanceOf[String], true, java.sql.Date.valueOf("2024-01-01")),
      ("s-1", 1L, "id1", "E", new java.sql.Timestamp(1), 1L,
        null.asInstanceOf[String], true, """{"secret":2}""",
        null.asInstanceOf[String], false, java.sql.Date.valueOf("2024-01-01")))
      .toDF("stream_id", "event_number", "event_id", "event_type", "timestamp",
        "log_position", "correlation_id", "is_json", "data", "metadata",
        "is_redacted", "p_date")
      .write.partitionBy("p_date").parquet(s"$dir/log")
    val q = graft.streaming.Subscriptions.subscribeAll(spark, s"$dir/log",
        filter = col("data").contains("secret"))
      .writeStream.format("memory").queryName("redactflt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT event_number FROM redactflt")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), "only the unredacted event's payload may match")
  }

  test("compiled streaming projections scrub flag-only frames " +
    "(native agg and stepper paths)") {
    import spark.implicits._
    val log = Seq(
      ("k-1", 0L, "E", 0L, """{"n":100}""", true),
      ("k-1", 1L, "E", 1L, """{"n":100}""", false))
      .toDF("stream_id", "event_number", "event_type", "log_position",
        "data", "is_redacted")
      .withColumn("timestamp", expr("timestamp_millis(log_position)"))
      .withColumn("correlation_id", lit(null).cast("string"))
      .withColumn("value", lit(0.0))
    // native-agg path: a body-matching count must not see the redacted
    // payload (both rows carry n=100 on disk; only the unredacted one
    // may match once data is scrubbed)
    val agg = graft.projections.js.JsProjection.compile("""
fromAll().foreachStream().when({
    $init: function() { return { hits: 0, n: 0 }; },
    E: function(s, e) {
        if (e.body && e.body.n === 100) { s.hits += 1; }
        s.n += 1;
        return s;
    }
})""")
    assert(agg.compilesToColumns)
    val aggOut = agg.fastStatesStream(log)
    assert(aggOut.isDefined)
    assert(aggOut.get.collect().toMap.apply("k-1") == """{"hits":1,"n":2}""")
    // stepper path: the same read behind a first-event pre-state guard —
    // the FIRST event is the redacted one, so its body must read empty
    val step = graft.projections.js.JsProjection.compile("""
fromAll().foreachStream().when({
    $init: function() { return { count: 0, hits: 0 }; },
    E: function(s, e) {
        if (s.count === 0) { if (e.body && e.body.n === 100) { s.hits += 1; } }
        s.count += 1;
        return s;
    }
})""")
    assert(step.compilesToColumns)
    val stepOut = step.fastStatesStream(log)
    assert(stepOut.isDefined)
    assert(stepOut.get.collect().toMap.apply("k-1") == """{"count":2,"hits":0}""")
  }

  test("redact on a pre-flag legacy log upgrades the WHOLE log's schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftredactlegacy").toString
    // a log written before is_redacted existed, across TWO partitions
    Seq(
      ("a-1", 0L, "id0", "E", new java.sql.Timestamp(0), 0L,
        null.asInstanceOf[String], true, """{"secret":1}""",
        null.asInstanceOf[String], java.sql.Date.valueOf("2024-01-01")),
      ("a-1", 1L, "id1", "E", new java.sql.Timestamp(86400000), 1L,
        null.asInstanceOf[String], true, """{"x":2}""",
        null.asInstanceOf[String], java.sql.Date.valueOf("2024-01-02")))
      .toDF("stream_id", "event_number", "event_id", "event_type", "timestamp",
        "log_position", "correlation_id", "is_json", "data", "metadata", "p_date")
      .write.partitionBy("p_date").parquet(s"$dir/log")
    val store = new EventLogStore(spark, dir)
    assert(store.redact("a-1", 0L) == 1L)
    // EVERY partition now carries the flag on disk — no mixed-schema log
    // whose non-merged inference could sample a flagless footer
    for (d <- Seq("2024-01-01", "2024-01-02"))
      assert(spark.read.parquet(s"$dir/log/p_date=$d").columns.contains("is_redacted"),
        s"partition $d must carry the flag after the upgrade")
    val rows = store.read().orderBy("event_number")
      .select("data", "is_redacted").collect()
    assert(rows.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("", true), ("""{"x":2}""", false)))
  }

  test("envelope schema carries is_redacted and $mem- streams round-trip it") {
    assert(EventEnvelope.schema.fieldNames.contains("is_redacted"))
    val env = EventEnvelope("s", 0L, "id", "T",
      new java.sql.Timestamp(0), 0L, null, is_json = true, "{}", null)
    assert(!env.is_redacted)
  }
}
