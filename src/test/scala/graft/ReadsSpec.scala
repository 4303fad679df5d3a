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
}
