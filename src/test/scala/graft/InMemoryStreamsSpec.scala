package graft

import java.nio.file.Files

import graft.sources.{EventLogStore, InMemoryLog, InMemoryStreams, PendingEvent}

/** S6 `$mem-` streams: single-event retention, monotone numbering, shared
  * commit counter, NoStream dispatch, envelope-DF surfacing, routing
  * (SingleEventInMemoryStream.cs / InMemoryStreamReader.cs / InMemoryLog.cs). */
class InMemoryStreamsSpec extends SparkTestBase {
  import InMemoryStreams._

  test("only the last event is retained; event numbers keep increasing") {
    val mem = new InMemoryStreams
    val s = mem.stream("$mem-node-state")
    s.write("$NodeStateChanged", """{"state":"Initializing"}""")
    s.write("$NodeStateChanged", """{"state":"Leader"}""")
    val r = mem.readForwards("$mem-node-state")
    assert(r.result == Success)
    assert(r.events.map(_.event_number) == Seq(1L))
    assert(r.events.head.data.contains("Leader"))
    assert(r.lastEventNumber == 1L && r.nextEventNumber == 2L)
  }

  test("forward read window semantics (SingleEventInMemoryStream.cs:30-72)") {
    val mem = new InMemoryStreams
    val s = mem.stream("$mem-x")
    s.write("T", "{}"); s.write("T", "{}") // last = event 1
    assert(mem.readForwards("$mem-x", from = 0).events.size == 1)
    assert(mem.readForwards("$mem-x", from = 1).events.size == 1)
    assert(mem.readForwards("$mem-x", from = 2).events.isEmpty)
    assert(mem.readForwards("$mem-x", from = 2).result == Success)
  }

  test("backward read window semantics incl from-end (cs:74-116)") {
    val mem = new InMemoryStreams
    val s = mem.stream("$mem-x")
    s.write("T", "{}"); s.write("T", "{}") // last = event 1
    assert(mem.readBackwards("$mem-x").events.size == 1) // from end
    assert(mem.readBackwards("$mem-x", from = 1).events.size == 1)
    assert(mem.readBackwards("$mem-x", from = 5).events.size == 1)
    assert(mem.readBackwards("$mem-x", from = 0).events.isEmpty)
  }

  test("unknown stream answers NoStream (InMemoryStreamReader.cs:22-36)") {
    val mem = new InMemoryStreams
    val r = mem.readForwards("$mem-unknown")
    assert(r.result == NoStream && r.events.isEmpty &&
      r.lastEventNumber == -1L && r.nextEventNumber == -1L)
    assert(mem.readBackwards("$mem-unknown").result == NoStream)
  }

  test("shared commit-position counter across streams (InMemoryLog.cs)") {
    val mem = new InMemoryStreams
    val a = mem.stream("$mem-a").write("T", "{}")
    val b = mem.stream("$mem-b").write("T", "{}")
    val a2 = mem.stream("$mem-a").write("T", "{}")
    assert(Seq(a.log_position, b.log_position, a2.log_position) == Seq(1L, 2L, 3L))
    assert(mem.memLog.lastCommitPosition == 3L)
  }

  test("non-$mem stream id is rejected at registration") {
    val mem = new InMemoryStreams
    intercept[IllegalArgumentException](mem.stream("orders-1"))
  }

  test("DF surface matches the envelope schema and composes") {
    val mem = new InMemoryStreams
    mem.nodeStateChanged("Leader")
    val df = mem.toDF(spark, mem.readForwards(NodeStateStream))
    assert(df.schema == graft.model.EventEnvelope.schema)
    val row = df.selectExpr("stream_id", "event_type",
      "get_json_object(data, '$.state') AS st").head()
    assert(row.getString(0) == "$mem-node-state")
    assert(row.getString(1) == NodeStateChangedEventType)
    assert(row.getString(2) == "Leader")
    assert(mem.toDF(spark, mem.readForwards("$mem-none")).count() == 0)
  }

  test("gossip listener payload shape (GossipListenerService.cs:33-45)") {
    val mem = new InMemoryStreams
    mem.gossipUpdated("node-1", Seq("n1:2113", "n2:2113"))
    val df = mem.toDF(spark, mem.readForwards(GossipStream))
    val row = df.selectExpr("get_json_object(data, '$.nodeId')",
      "get_json_object(data, '$.members[1]')").head()
    assert(row.getString(0) == "node-1" && row.getString(1) == "n2:2113")
  }

  test("route dispatches by prefix (StorageReaderWorker.cs:49)") {
    val dir = Files.createTempDirectory("graftmem").toString
    val store = new EventLogStore(spark, dir)
    store.append(Seq(PendingEvent("orders-1", "e1", "Placed", "{}")))
    val mem = new InMemoryStreams
    mem.nodeStateChanged("Follower")
    assert(mem.route(spark, store, "orders-1").count() == 1)
    val memRow = mem.route(spark, store, NodeStateStream)
      .select("event_type").head().getString(0)
    assert(memRow == NodeStateChangedEventType)
  }
}
