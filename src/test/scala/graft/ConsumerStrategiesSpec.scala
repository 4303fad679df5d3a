package graft

import org.apache.spark.sql.functions._

import graft.projections.LogEvent
import graft.streaming._

/** SUB3 competing-consumer dispatch strategies: rotation, saturation,
  * bucket stickiness, rebalance on join, orphaning on leave, correlation
  * pinning, and the distributed batch assignment analogs
  * (ConsumerStrategy sources + PinnedState/PinnedConsumerState.cs). */
class ConsumerStrategiesSpec extends SparkTestBase {
  import ConsumerStrategies._

  private def mkEv(stream: String, n: Long = 0L, tpe: String = "E",
      data: String = "{}", meta: String = null, corr: String = null): LogEvent =
    LogEvent(stream, n, tpe, n, null, corr, data, 0.0, metadata = meta)

  test("RoundRobin rotates across clients with capacity (cs:36-47)") {
    val s = new RoundRobinStrategy
    val a = new ConsumerClient("a", 10); val b = new ConsumerClient("b", 10)
    s.clientAdded(a); s.clientAdded(b)
    (1 to 4).foreach(i => assert(s.push(mkEv(s"s-$i")) == Sent))
    assert(a.inFlight == 2 && b.inFlight == 2)
  }

  test("RoundRobin skips full clients; all-full is NoMoreCapacity") {
    val s = new RoundRobinStrategy
    val a = new ConsumerClient("a", 1); val b = new ConsumerClient("b", 2)
    s.clientAdded(a); s.clientAdded(b)
    assert((1 to 3).map(i => s.push(mkEv(s"s-$i"))).forall(_ == Sent))
    assert(a.inFlight == 1 && b.inFlight == 2)
    assert(s.push(mkEv("s-4")) == NoMoreCapacity)
    a.confirm()
    assert(s.push(mkEv("s-5")) == Sent && a.inFlight == 1)
  }

  test("RoundRobin removal of unknown client throws (cs:23-26)") {
    val s = new RoundRobinStrategy
    intercept[IllegalStateException](s.clientRemoved(new ConsumerClient("x", 1)))
  }

  test("DispatchToSingle saturates the head before rotating (cs:14-24)") {
    val s = new DispatchToSingleStrategy
    val a = new ConsumerClient("a", 2); val b = new ConsumerClient("b", 2)
    s.clientAdded(a); s.clientAdded(b)
    (1 to 3).foreach(i => assert(s.push(mkEv(s"s-$i")) == Sent))
    assert(a.inFlight == 2 && b.inFlight == 1)
    (4 to 4).foreach(i => assert(s.push(mkEv(s"s-$i")) == Sent))
    assert(s.push(mkEv("s-5")) == NoMoreCapacity)
  }

  test("Pinned: same source stream always reaches the same client") {
    val s = new PinnedStrategy
    val a = new ConsumerClient("a", 100); val b = new ConsumerClient("b", 100)
    s.clientAdded(a); s.clientAdded(b)
    val events = (1 to 50).flatMap(i => Seq(mkEv(s"acct-$i", 0), mkEv(s"acct-$i", 1)))
    events.foreach(e => assert(s.push(e) == Sent))
    // every stream's two events landed on one client
    val byStream = (a.delivered.map(_ -> "a") ++ b.delivered.map(_ -> "b"))
      .groupBy(_._1.stream_id).values
    assert(byStream.forall(g => g.map(_._2).distinct.size == 1))
    assert(a.inFlight > 0 && b.inFlight > 0) // and the load actually split
  }

  test("Pinned: link events pin by the link TARGET stream (cs:86-104)") {
    val s = new PinnedStrategy
    val a = new ConsumerClient("a", 100)
    s.clientAdded(a)
    val direct = mkEv("orders-7")
    val link = mkEv("$ce-orders", tpe = "$>", data = "3@orders-7")
    assert(s.bucketFor(direct) == s.bucketFor(link))
    val resolved = mkEv("$ce-orders", tpe = "$>", data = "3@orders-7")
      .copy(resolved_stream_id = "orders-7", resolved_event_number = 3L)
    assert(s.bucketFor(resolved) == s.bucketFor(direct))
  }

  test("Pinned: zero capacity is NoMoreCapacity; full pinned client Skipped") {
    val s = new PinnedStrategy
    val a = new ConsumerClient("a", 1)
    s.clientAdded(a)
    assert(s.push(mkEv("x-1")) == Sent)
    // a is full: a DIFFERENT stream cannot go anywhere -> capacity gate
    assert(s.push(mkEv("x-2")) == NoMoreCapacity)
    val b = new ConsumerClient("b", 1)
    s.clientAdded(b)
    // now capacity exists, but x-1's bucket is pinned to the full a -> Skipped
    assert(s.push(mkEv("x-1")) == Skipped)
    assert(s.push(mkEv("x-2")) == Sent) // fresh bucket -> least-assigned b
  }

  test("Pinned rebalance: a joining client takes over excess buckets (PinnedConsumerState.cs:76-110)") {
    val s = new PinnedStrategy
    val a = new ConsumerClient("a", 10000)
    s.clientAdded(a)
    val events = (1 to 200).map(i => mkEv(s"st-$i"))
    events.foreach(e => assert(s.push(e) == Sent))
    val before = events.map(e => s.assignedClientFor(e).get)
    assert(before.forall(_ == "a"))
    val b = new ConsumerClient("b", 10000)
    s.clientAdded(b)
    val after = events.map(e => s.assignedClientFor(e).get)
    // roughly half the assigned buckets moved to b
    val moved = after.count(_ == "b")
    assert(moved > 0, "joiner received no buckets")
    val distinctBuckets = events.map(s.bucketFor).distinct.size
    assert(moved <= (distinctBuckets + 1) / 2 + 1)
  }

  test("Pinned orphaning: removed client's buckets reassign on next push (PinnedConsumerState.cs:43-74)") {
    val s = new PinnedStrategy
    val a = new ConsumerClient("a", 100); val b = new ConsumerClient("b", 100)
    s.clientAdded(a); s.clientAdded(b)
    val e = mkEv("acct-42")
    assert(s.push(e) == Sent)
    val owner = s.assignedClientFor(e).get
    val (gone, stay) = if (owner == "a") (a, b) else (b, a)
    s.clientRemoved(gone)
    assert(s.push(e) == Sent)
    assert(s.assignedClientFor(e).get == stay.clientId)
    assert(stay.delivered.exists(_.stream_id == "acct-42"))
  }

  test("PinnedByCorrelation pins by $correlationId metadata, falls back to stream (cs:22-32)") {
    val s = new PinnedByCorrelationStrategy
    val a = new ConsumerClient("a", 100)
    s.clientAdded(a)
    val e1 = mkEv("x-1", meta = """{"$correlationId":"corr-9"}""")
    val e2 = mkEv("y-2", meta = """{"other":1,"$correlationId":"corr-9"}""")
    assert(s.bucketFor(e1) == s.bucketFor(e2))
    // no metadata property: envelope correlation_id, then stream id
    val e3 = mkEv("x-1", corr = "corr-9")
    assert(s.bucketFor(e3) == s.bucketFor(e1))
    val e4 = mkEv("z-3")
    assert(s.bucketFor(e4) == s.bucketFor(mkEv("z-3", tpe = "Other")))
  }

  test("correlationFromJson probes only string-valued top-level property") {
    assert(correlationFromJson("""{"$correlationId":"c1"}""") == "c1")
    assert(correlationFromJson("""{"$correlationId": 42}""") == null)
    assert(correlationFromJson("""{"a":"b"}""") == null)
    assert(correlationFromJson(null) == null)
  }

  test("batch pinnedAssignment is sticky per stream and balances") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"acct-${i % 60}", i.toLong, "E", "{}"))
      .toDF("stream_id", "log_position", "event_type", "data")
      .withColumn("correlation_id", lit(null).cast("string"))
    val consumers = Seq("c0", "c1", "c2")
    val out = ConsumerStrategies.assign(df, Pinned, consumers)
    val perStream = out.groupBy("stream_id")
      .agg(countDistinct("consumer").as("n")).agg(max("n")).head().getLong(0)
    assert(perStream == 1L, "a stream was split across consumers")
    val loads = out.groupBy("consumer").count().collect().map(_.getLong(1))
    assert(loads.length == 3 && loads.min > 0)
  }

  test("batch pinnedAssignment pins link rows to target-stream shard") {
    import spark.implicits._
    val df = Seq(
      ("orders-7", 1L, "E", "{}"),
      ("$ce-orders", 2L, "$>", "3@orders-7")
    ).toDF("stream_id", "log_position", "event_type", "data")
      .withColumn("correlation_id", lit(null).cast("string"))
    val out = ConsumerStrategies.assign(df, Pinned, Seq("c0", "c1", "c2", "c3"))
      .select("consumer").collect().map(_.getString(0))
    assert(out(0) == out(1))
  }

  test("batch roundRobinAssignment balances exactly in log order") {
    import spark.implicits._
    val df = (1 to 9).map(i => (s"s-$i", i.toLong, "E", "{}"))
      .toDF("stream_id", "log_position", "event_type", "data")
    val out = ConsumerStrategies.assign(df, RoundRobin, Seq("c0", "c1", "c2"))
    val loads = out.groupBy("consumer").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(loads == Map("c0" -> 3L, "c1" -> 3L, "c2" -> 3L))
    val first = out.orderBy("log_position").select("consumer")
      .limit(3).collect().map(_.getString(0)).toSeq
    assert(first == Seq("c0", "c1", "c2"))
  }

  test("forName resolves registry names; unknown throws (Registry.cs)") {
    assert(forName(RoundRobin).name == RoundRobin)
    assert(forName(DispatchToSingle).name == DispatchToSingle)
    assert(forName(Pinned).name == Pinned)
    assert(forName(PinnedByCorrelation).name == PinnedByCorrelation)
    intercept[IllegalArgumentException](forName("Nope"))
  }
}
