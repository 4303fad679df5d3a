package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventFilters, Reads}

/** S2/S3 reads + F1–F5 filters over the FIXTURES.md filter corpus. */
class ReadsSpec extends SparkTestBase {

  private lazy val log = envelope(Seq(
    ev("account-1", 0, "PaymentProcessed", 0),
    ev("account-1", 1, "PaymentProcessed", 1),
    ev("account-1", 2, "OrderPlaced", 2),
    ev("order-1", 0, "OrderPlaced", 3),
    ev("$sys-1", 0, "SysEvent", 4),
    ev("$epoch-information", 0, "EpochInfo", 5),
    ev("$persistentsubscription-$all::g-checkpoint", 0, "Chk", 6),
    ev("$persistentsubscription-$all::g-parked", 0, "Parked", 7),
    ev("$persistentsubscription-other::g-checkpoint", 0, "Chk", 8),
    ev("$settings", 0, "Settings", 9)
  ))

  test("S2 read stream forwards honors from + maxCount + order") {
    val r = Reads.readStreamForwards(log, "account-1", from = 1, maxCount = 5)
      .select("event_number").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 2L))
  }

  test("S2 read stream backwards from end") {
    val r = Reads.readStreamBackwards(log, "account-1", maxCount = 2)
      .select("event_number").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(2L, 1L))
  }

  test("S2 read stream backwards from a position") {
    val r = Reads.readStreamBackwards(log, "account-1", from = 1)
      .select("event_number").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 0L))
  }

  test("S3 read all forwards from position, bounded") {
    val r = Reads.readAllForwards(log, fromPosition = 3, maxCount = 2)
      .select("log_position").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(3L, 4L))
  }

  test("S4 filtered read all: event-type prefix") {
    val r = Reads.readAllForwards(log,
      filter = EventFilters.eventTypePrefix(Seq("Payment")))
    assert(r.count() == 2)
  }

  test("F2/F4 regex filters") {
    assert(log.where(EventFilters.streamRegex("^account-\\d+$")).count() == 3)
    assert(log.where(EventFilters.eventTypeRegex("Placed$")).count() == 2)
  }

  test("F5 default $all filter: deny-list semantics (EventFilter.cs:66-135)") {
    val kept = log.where(EventFilters.defaultAllFilter)
      .select("stream_id").collect().map(_.getString(0)).toSet
    // non-$ streams and generic system streams allowed
    assert(kept.contains("account-1") && kept.contains("order-1"))
    assert(kept.contains("$sys-1") && kept.contains("$settings"))
    // PS-to-other-streams checkpoint allowed (prefix must be $all::)
    assert(kept.contains("$persistentsubscription-other::g-checkpoint"))
    // denied: epoch info + PS-to-$all checkpoint/parked
    assert(!kept.contains("$epoch-information"))
    assert(!kept.contains("$persistentsubscription-$all::g-checkpoint"))
    assert(!kept.contains("$persistentsubscription-$all::g-parked"))
  }

  test("link resolution parity: tombstoned/truncated/missing targets leave " +
    "the link unresolved and delivered, never dropped (StorageReaderWorker " +
    "ForFailedResolvedLink)") {
    import graft.sources.{EventLogStore, PendingEvent}
    import org.apache.spark.sql.functions.col
    val store = new EventLogStore(spark,
      java.nio.file.Files.createTempDirectory("linkparity").toString)
    store.append(Seq(
      PendingEvent("src-1", "s0", "Ev", """{"v":0}"""),
      PendingEvent("src-1", "s1", "Ev", """{"v":1}"""),
      PendingEvent("gone-1", "g0", "Ev", """{"v":9}"""),
      PendingEvent("trunc-1", "t0", "Ev", """{"v":8}"""),
      PendingEvent("trunc-1", "t1", "Ev", """{"v":7}"""),
      PendingEvent("links-1", "l0", "$>", "1@src-1"),
      PendingEvent("links-1", "l1", "$>", "0@gone-1"),
      PendingEvent("links-1", "l2", "$>", "0@trunc-1"),
      PendingEvent("links-1", "l3", "$>", "9@src-1"),
      PendingEvent("links-1", "l4", "$>", "garbage-no-separator")))
    store.tombstone("gone-1") // hard delete
    store.setMetadata("trunc-1", truncateBefore = Some(1L)) // $tb clips t0
    // readRetained is the reader-visible log (tombstones and $tb applied)
    val log = store.readRetained()

    // resolveInline ($includeLinks read path): all five links delivered
    val inline = graft.operators.Links.resolveInline(log)
      .where(col("stream_id") === "links-1")
      .collect().map(r => r.getAs[Long]("event_number") -> r).toMap
    assert(inline.size == 5, "every link row must survive resolution")
    val ok = inline(0L)
    assert(ok.getAs[String]("event_type") == "Ev" &&
      ok.getAs[String]("data") == """{"v":1}""" &&
      ok.getAs[String]("resolved_stream_id") == "src-1" &&
      ok.getAs[Long]("resolved_event_number") == 1L)
    for (n <- 1L to 4L) {
      val r = inline(n)
      assert(r.getAs[String]("event_type") == "$>", s"link $n must stay a link")
      assert(r.getAs[String]("resolved_stream_id") == null, s"link $n resolved null")
      assert(r.getAs[Long]("resolved_event_number") == -1L)
    }
    // the failed links deliver their own raw payload, like a reference
    // subscriber seeing ResolvedEvent.Link with a null .Event
    assert(inline(1L).getAs[String]("data") == "0@gone-1")
    assert(inline(4L).getAs[String]("data") == "garbage-no-separator")

    // batch resolve(): same survival contract, resolved_* columns null
    val links = log.where(col("event_type") === "$>")
    val joined = graft.operators.Links.resolve(links, log)
      .collect().map(r => r.getAs[Long]("event_number") ->
        r.getAs[String]("resolved_event_type")).toMap
    assert(joined == Map(0L -> "Ev", 1L -> null, 2L -> null, 3L -> null, 4L -> null))

    // scavenge physically removes the dead rows; the contract must hold
    // against the rewritten log too
    store.scavenge()
    val after = graft.operators.Links.resolveInline(store.readRetained())
      .where(col("stream_id") === "links-1")
      .collect().map(r => r.getAs[Long]("event_number") ->
        r.getAs[String]("resolved_stream_id")).toMap
    assert(after == Map(0L -> "src-1", 1L -> null, 2L -> null, 3L -> null, 4L -> null))
  }
}
