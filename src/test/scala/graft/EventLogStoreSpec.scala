package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.ExpectedVersion
import graft.sources.{EventLogStore, PendingEvent, WrongExpectedVersionException}

/** S1 append semantics: positions, idempotency, optimistic concurrency,
  * deletes, scavenge (FIXTURES.md corpus 7). */
class EventLogStoreSpec extends SparkTestBase {

  private def freshStore(): EventLogStore =
    new EventLogStore(spark, Files.createTempDirectory("graftlog").toString)

  private def pe(stream: String, id: String, tpe: String = "E"): PendingEvent =
    PendingEvent(stream, id, tpe, s"""{"id":"$id"}""")

  test("append assigns contiguous event numbers and monotone positions") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1"), pe("b-1", "e2"), pe("a-1", "e3")))
    store.append(Seq(pe("a-1", "e4")))
    val rows = store.read().orderBy("log_position")
      .select("stream_id", "event_number", "log_position").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a-1", 0L), ("b-1", 0L), ("a-1", 1L), ("a-1", 2L)))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("append is idempotent by event_id (EventRecord.cs EventId)") {
    val store = freshStore()
    assert(store.append(Seq(pe("a-1", "e1"), pe("a-1", "e1"))) == 1L)
    assert(store.append(Seq(pe("a-1", "e1"), pe("a-1", "e2"))) == 1L)
    assert(store.read().count() == 2)
  }

  test("expected-version semantics (ExpectedVersion.cs:6-13)") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1")), Map("a-1" -> ExpectedVersion.NoStream))
    intercept[WrongExpectedVersionException] {
      store.append(Seq(pe("a-1", "e2")), Map("a-1" -> ExpectedVersion.NoStream))
    }
    intercept[WrongExpectedVersionException] {
      store.append(Seq(pe("b-1", "e3")), Map("b-1" -> ExpectedVersion.StreamExists))
    }
    intercept[WrongExpectedVersionException] {
      store.append(Seq(pe("a-1", "e4")), Map("a-1" -> 5L))
    }
    store.append(Seq(pe("a-1", "e5")), Map("a-1" -> 0L)) // exact match ok
    assert(store.read().where(col("stream_id") === "a-1").count() == 2)
  }

  test("tombstoned stream forbids further appends; reads StreamDeleted") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1")))
    store.tombstone("a-1")
    intercept[WrongExpectedVersionException] { store.append(Seq(pe("a-1", "e2"))) }
    assert(store.readRetained().where(col("stream_id") === "a-1").count() == 0)
  }

  test("soft delete hides events; stream is recreatable (streams.md:65-120)") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "e1"), pe("a-1", "e2")))
    store.softDelete("a-1")
    assert(store.readRetained().where(col("stream_id") === "a-1").count() == 0)
    store.append(Seq(pe("a-1", "e3"))) // recreate
    val nums = store.readRetained().where(col("stream_id") === "a-1")
      .select("event_number").collect().map(_.getLong(0)).toSeq
    assert(nums == Seq(2L)) // numbering continues past the truncate point
  }

  test("maxCount metadata trims retained reads; scavenge makes it physical") {
    val store = freshStore()
    store.append((1 to 6).map(i => pe("a-1", s"e$i")))
    store.setMetadata("a-1", maxCount = Some(2L))
    val nums = store.readRetained().where(col("stream_id") === "a-1")
      .select("event_number").collect().map(_.getLong(0)).sorted.toSeq
    assert(nums == Seq(4L, 5L))
    val before = store.read().where(col("stream_id") === "a-1").count()
    store.scavenge()
    val after = store.read().where(col("stream_id") === "a-1").count()
    assert(before == 6 && after == 2)
    // retained view unchanged by scavenge
    assert(store.readRetained().where(col("stream_id") === "a-1").count() == 2)
  }

  test("appendBulk assigns order-respecting positions and per-stream numbers") {
    val store = freshStore()
    store.append(Seq(pe("a-1", "seed")))
    val s = spark; import s.implicits._
    val pending = Seq(
      ("a-1", "b1", "E", """{}""", null: String, null: String, ts("2024-01-02 00:00:00")),
      ("c-1", "b2", "E", """{}""", null: String, null: String, ts("2024-01-01 00:00:00")),
      ("a-1", "b3", "E", """{}""", null: String, null: String, ts("2024-01-03 00:00:00"))
    ).toDF("stream_id", "event_id", "event_type", "data", "metadata",
      "correlation_id", "timestamp")
    assert(store.appendBulk(pending) == 3L)
    val rows = store.read().orderBy("log_position")
      .select("stream_id", "event_number", "event_id", "log_position").collect()
    // bulk rows ordered by timestamp: c-1/b2 (01-01), a-1/b1 (01-02), a-1/b3 (01-03)
    assert(rows.map(_.getString(2)).toSeq == Seq("seed", "b2", "b1", "b3"))
    assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 1L, 2L, 3L))
    val a1 = rows.filter(_.getString(0) == "a-1")
    assert(a1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }
}
