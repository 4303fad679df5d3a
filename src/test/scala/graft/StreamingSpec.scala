package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{EventLogStore, PendingEvent}
import graft.streaming.Subscriptions
import graft.projections.Projections

/** SUB1/SUB2/P20: subscriptions as Structured Streaming; batch/stream
  * equivalence (mirrors the reference's dual-fixture pattern, SURVEY §5.4). */
class StreamingSpec extends SparkTestBase {

  private def newStore(): (EventLogStore, String) = {
    val dir = Files.createTempDirectory("graftstream").toString
    (new EventLogStore(spark, dir), dir)
  }

  private def seed(store: EventLogStore): Unit =
    store.append(Seq(
      PendingEvent("acct-1", "e1", "Deposited", """{"amt":10}"""),
      PendingEvent("acct-1", "e2", "Withdrawn", """{"amt":3}"""),
      PendingEvent("acct-2", "e3", "Deposited", """{"amt":5}"""),
      PendingEvent("sys-1", "e4", "Noise", """{}""")))

  test("SUB2: filtered $all subscription sees exactly the batch-filtered events") {
    val (store, dir) = newStore()
    seed(store)
    val q = Subscriptions.subscribeAll(spark, s"$dir/log",
        graft.operators.EventFilters.eventTypePrefix(Seq("Dep", "With")))
      .writeStream.format("memory").queryName("sub2")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT event_id FROM sub2").collect().map(_.getString(0)).toSet
    assert(got == Set("e1", "e2", "e3"))
  }

  test("subscribeAll(fromPosition) starts mid-log on a bucketed store") {
    val dir = Files.createTempDirectory("graftbsub").toString
    val store = new EventLogStore(spark, dir, requestedBuckets = 4)
    seed(store) // positions 0..3
    val q = Subscriptions.subscribeAll(spark, s"$dir/log", fromPosition = 1L)
      .writeStream.format("memory").queryName("submid")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT event_id, log_position, p_bucket FROM submid").collect()
    // schema carries the bucketed layout's p_bucket; only positions > 1 flow
    assert(rows.map(_.getString(0)).toSet == Set("e3", "e4"))
    assert(rows.forall(!_.isNullAt(2)))
  }

  test("R1 in streaming: a catch-up subscription over a retention-bounded " +
    "stream matches the batch retained read; the live tail still flows") {
    val (store, dir) = newStore()
    store.append((0 until 6).map(i =>
      PendingEvent("ret-1", s"r$i", "Tick", s"""{"n":$i}""")))
    store.setMetadata("ret-1", maxCount = Some(2)) // keep the last two
    val checkpoint = Files.createTempDirectory("retck").toString
    val out = Files.createTempDirectory("retout").toString + "/out"
    val stream = Subscriptions.subscribeStreamRetained(spark, s"$dir/log", "ret-1")
    def runOnce(): Unit = {
      val q = stream.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce() // catch-up honors retention
    val got = spark.read.parquet(out).select("event_number").collect()
      .map(_.getLong(0)).sorted.toSeq
    val batch = store.readRetained().where(col("stream_id") === "ret-1")
      .select("event_number").collect().map(_.getLong(0)).sorted.toSeq
    assert(batch == Seq(4L, 5L))
    assert(got == batch, "subscription must match the batch retained read")
    // live tail: new events are above any start-time bound by construction
    store.append(Seq(PendingEvent("ret-1", "r9", "Tick", """{"n":9}""")))
    runOnce()
    val nums = spark.read.parquet(out).select("event_number").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(nums == Seq(4L, 5L, 6L))
    // a tombstoned stream subscribes to nothing
    val (store2, dir2) = newStore()
    seed(store2)
    store2.tombstone("acct-1")
    val q2 = Subscriptions.subscribeStreamRetained(spark, s"$dir2/log", "acct-1")
      .writeStream.format("memory").queryName("rettomb")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.sql("SELECT * FROM rettomb").isEmpty)
  }

  test("retained subscriptions over an existing-but-empty log dir subscribe " +
    "to empty history instead of failing schema inference") {
    val dir = Files.createTempDirectory("retempty").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/log"))
    for ((stream, name) <- Seq(
        Subscriptions.subscribeStreamRetained(spark, s"$dir/log", "a-1") -> "remp1",
        Subscriptions.subscribeAllRetained(spark, s"$dir/log") -> "remp2")) {
      val q = stream.writeStream.format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(spark.sql(s"SELECT * FROM $name").isEmpty)
    }
  }

  test("R1 in streaming: $all retained subscription == batch retained read " +
    "across mixed per-stream metadata") {
    val (store, dir) = newStore()
    store.append((0 until 6).map(i =>
      PendingEvent("cap-1", s"c$i", "Tick", s"""{"n":$i}""")))
    store.append((0 until 3).map(i =>
      PendingEvent("free-1", s"f$i", "Tick", s"""{"n":$i}""")))
    store.append(Seq(PendingEvent("gone-1", "g0", "Tick", "{}")))
    store.setMetadata("cap-1", maxCount = Some(2))
    store.tombstone("gone-1")
    val q = Subscriptions.subscribeAllRetained(spark, s"$dir/log")
      .writeStream.format("memory").queryName("retall")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT stream_id, event_number FROM retall").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = store.readRetained().select("stream_id", "event_number")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(got == Set(("cap-1", 4L), ("cap-1", 5L),
      ("free-1", 0L), ("free-1", 1L), ("free-1", 2L)))
    // the store's stats-table fast path produces the same subscription
    val q3 = store.subscribeAllRetained()
      .writeStream.format("memory").queryName("retall2")
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(60000)
    val gotStats = spark.sql("SELECT stream_id, event_number FROM retall2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotStats == batch, "stats-derived bounds must match the log-derived ones")
  }

  test("SUB1: catch-up then live — a second append is picked up by the next trigger") {
    val (store, dir) = newStore()
    seed(store)
    val stream = Subscriptions.subscribeStream(spark, s"$dir/log", "acct-1")
    val checkpoint = Files.createTempDirectory("ck").toString
    val out = Files.createTempDirectory("sub1out").toString + "/out"
    def runOnce(): Unit = {
      val q = stream.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append").option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce() // catch-up
    assert(spark.read.parquet(out).count() == 2)
    store.append(Seq(PendingEvent("acct-1", "e9", "Deposited", """{"amt":7}""")))
    runOnce() // live tail picks up only the new event (offsets persisted)
    val nums = spark.read.parquet(out).select("event_number").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(nums == Seq(0L, 1L, 2L))
  }

  test("P20: streaming projection state equals batch fold state") {
    val (store, dir) = newStore()
    seed(store)
    store.append(Seq(PendingEvent("acct-1", "e5", "Deposited", """{"amt":2}""")))
    val s = spark; import s.implicits._

    def amt(data: String): Long =
      """"amt":(\d+)""".r.findFirstMatchIn(data).map(_.group(1).toLong).getOrElse(0L)
    val stepFn = (bal: Long, e: graft.projections.LogEvent) =>
      if (e.event_type == "Deposited") bal + amt(e.data)
      else if (e.event_type == "Withdrawn") bal - amt(e.data) else bal

    // batch fold
    val batchStates = Projections.fromCategory("acct")
      .foreachStream().init(0L).whenAny(stepFn)
      .states(store.read()).collect().toMap

    // streaming fold (flatMapGroupsWithState), one AvailableNow pass
    val streamDf = Subscriptions.subscribeAll(spark, s"$dir/log")
    val q = Subscriptions.projectionStream[Long](
        streamDf.where(col("stream_id").startsWith("acct-")),
        e => Option(e.stream_id), () => 0L, stepFn)
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("proj").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamStates = spark.sql("SELECT partition, max_by(state, state) FROM proj GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // last update per partition — with one trigger there is exactly one row each
    val lastStates = spark.sql(
      "SELECT partition, state FROM proj").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batchStates == Map("acct-1" -> 9L, "acct-2" -> 5L))
    assert(lastStates == batchStates)
    assert(streamStates.keySet == batchStates.keySet)
  }

  test("P20 JS: streaming JS projection state equals batch JS states") {
    val (store, dir) = newStore()
    seed(store)
    store.append(Seq(PendingEvent("acct-1", "e5", "Deposited", """{"amt":2}""")))
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $init: function() { return { bal: 0 } },
        Deposited: function(s, e) { s.bal += e.body.amt; return s; },
        Withdrawn: function(s, e) { s.bal -= e.body.amt; return s; }
    })""")
    val batch = p.states(store.read()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val q = p.statesStream(
        Subscriptions.subscribeAll(spark, s"$dir/log")
          .where(col("stream_id").startsWith("acct-")))
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("jsproj").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT partition, state FROM jsproj").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch == Map(
      "acct-1" -> """{"bal":9}""", "acct-2" -> """{"bal":5}"""))
    assert(streamed == batch)
  }

  test("P20 JS compiled: statesStream runs as a native streaming " +
    "aggregation, equals batch states across a restart") {
    val (store, dir) = newStore()
    seed(store)
    // sums + a running extremum: the compilable subset → the streaming
    // query must be a real streaming AGG (StateStoreSave, no
    // FlatMapGroupsWithState), with typed partial state, and still equal
    // the batch fold exactly — including across a checkpoint restart
    val p = graft.projections.js.JsProjection.compile("""
fromAll()
    .foreachStream()
    .when({
        $init: function() { return { n: 0, last: -1 }; },
        $any: function(s, e) {
            s.n += 1;
            s.last = Math.max(s.last, e.sequenceNumber);
            return s;
        }
    })""")
    assert(p.compilesToColumns)
    val src = Subscriptions.subscribeAll(spark, s"$dir/log")
      .where(col("stream_id").startsWith("acct-"))
    val fastDs = p.fastStatesStream(src)
    assert(fastDs.isDefined, "compiled definition must take the agg path")
    val planStr = fastDs.get.queryExecution.analyzed.toString
    assert(!planStr.contains("FlatMapGroupsWithState"),
      "fast streaming path must not use the object fold")

    val ck = Files.createTempDirectory("jsaggck").toString
    def runPass(): Map[String, String] = {
      val captured = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val q = p.statesStream(
          Subscriptions.subscribeAll(spark, s"$dir/log")
            .where(col("stream_id").startsWith("acct-")))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
          b.collect().foreach { case (k, v) => captured.put(k, v) }: Unit
        }
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      import scala.jdk.CollectionConverters._
      captured.asScala.toMap
    }
    val first = runPass()
    val batch1 = p.states(store.read().where(col("stream_id").startsWith("acct-")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first == batch1)
    // restart on the same checkpoint with a tail: typed agg state must
    // resume (counts continue, max keeps its high-water mark)
    store.append(Seq(
      PendingEvent("acct-1", "e9", "Deposited", """{"amt":1}"""),
      PendingEvent("acct-3", "e10", "Opened", """{}""")))
    val second = runPass()
    val batch2 = p.states(store.read().where(col("stream_id").startsWith("acct-")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // second pass emits only touched keys; each must carry the FULL
    // accumulated state
    assert(second.keySet == Set("acct-1", "acct-3"))
    assert(second("acct-1") == batch2("acct-1"))
    assert(second("acct-3") == batch2("acct-3"))
  }

  test("P20 JS pre-state guards: statesStream serves the window plan " +
    "through the typed stepper, first-event semantics hold across batches") {
    val (store, dir) = newStore()
    seed(store)
    val p = graft.projections.js.JsProjection.compile("""
fromAll()
    .foreachStream()
    .when({
        $init: function() { return { count: 0, first: 0 }; },
        $any: function(s, e) {
            if (s.count === 0) { s.first += e.sequenceNumber + 7; }
            s.count += 1;
            return s;
        }
    })""")
    // batch compiles (the r10 pre-state window)…
    assert(p.compilesToColumns)
    // …and the streaming fast path serves it NATIVELY (r14): the typed
    // stepper folds the running value the window reconstructs as
    // flatMapGroupsWithState state — a per-batch window would have
    // re-flagged "first" in every micro-batch
    val src = Subscriptions.subscribeAll(spark, s"$dir/log")
      .where(col("stream_id").startsWith("acct-"))
    assert(p.fastStatesStream(src).isDefined,
      "pre-state plan must take the stepper path")
    // …unless the stepper is disabled — then the interpreter state store
    spark.conf.set("spark.graft.js.streamStepper", "false")
    try assert(p.fastStatesStream(src).isEmpty)
    finally spark.conf.unset("spark.graft.js.streamStepper")

    val ck = Files.createTempDirectory("jspreck").toString
    def runPass(): Map[String, String] = {
      val captured = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val q = p.statesStream(
          Subscriptions.subscribeAll(spark, s"$dir/log")
            .where(col("stream_id").startsWith("acct-")))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
          b.collect().foreach { case (k, v) => captured.put(k, v) }: Unit
        }
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      import scala.jdk.CollectionConverters._
      captured.asScala.toMap
    }
    val first = runPass()
    val batch1 = p.states(store.read().where(col("stream_id").startsWith("acct-")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first == batch1, "stream (interpreter) must equal batch (compiled)")
    // a tail batch must NOT re-trigger the first-event guard: the state
    // store remembers count > 0 across micro-batches and restarts
    store.append(Seq(PendingEvent("acct-1", "e9", "Deposited", """{"amt":1}""")))
    val second = runPass()
    val batch2 = p.states(store.read().where(col("stream_id").startsWith("acct-")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(second("acct-1") == batch2("acct-1"))
  }

  test("P20 JS pre-state oracles stream == batch across micro-batches, " +
    "stepper path (js_first_event / js_high_water / js_map_guard / js_array_guard)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def le(stream: String, num: Long, tpe: String, pos: Long, v: Double,
        k: String) = graft.projections.LogEvent(
      stream, num, tpe, pos, new java.sql.Timestamp(pos * 1000), null,
      s"""{"k":"$k"}""", v)
    // two arrival batches; every pre-state guard crosses the boundary:
    // first-event (purchase-1's first purchase is in batch 1), high-water
    // rises + consecutive-type repeats + new low, map burst counts, and
    // the distinct-type array breadth — all continue in batch 2
    val batchA = Seq(
      le("purchase-1", 0, "purchase", 0, 1.50, "a"),
      le("purchase-1", 1, "click", 1, 2.00, "a"),
      le("purchase-1", 2, "purchase", 2, 0.75, "b"),
      le("purchase-2", 0, "purchase", 3, 9.99, "a"))
    val batchB = Seq(
      le("purchase-1", 3, "purchase", 4, 5.00, "a"),
      le("purchase-1", 4, "click", 5, 1.25, "b"),
      le("purchase-1", 5, "click", 6, 0.10, "b"),
      le("purchase-2", 1, "view", 7, 2.50, "a"),
      le("purchase-2", 2, "purchase", 8, 0.05, "a"))
    val defs = graft.projections.js.JsProjectionQueries.handlerCorpus.toMap
    for (name <- Seq("js_first_event", "js_high_water", "js_map_guard",
        "js_array_guard")) {
      val p = graft.projections.js.JsProjection.compile(defs(name))
      assert(p.compilesToColumns, s"$name must compile")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[graft.projections.LogEvent]
      // the stepper path must engage: no interpreter node in the plan
      assert(p.fastStatesStream(input.toDF()).isDefined,
        s"$name must take the typed stepper path")
      val ck = Files.createTempDirectory(s"jsstep_$name").toString
      val captured = new java.util.concurrent.ConcurrentHashMap[String, String]()
      def runPass(): Map[String, String] = {
        val q = p.statesStream(input.toDF()).writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
            b.collect().foreach { case (k, v) => captured.put(k, v) }: Unit
          }
          .option("checkpointLocation", ck)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
        captured.asScala.toMap
      }
      def batchStates(rows: Seq[graft.projections.LogEvent]): Map[String, String] =
        p.states(rows.toDF()).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      input.addData(batchA: _*)
      assert(runPass() == batchStates(batchA), s"$name pass 1")
      input.addData(batchB: _*)
      assert(runPass() == batchStates(batchA ++ batchB),
        s"$name pass 2 (state must continue across micro-batches)")
    }
  }

  test("P20 JS compiled streaming: nested-state definition takes the agg " +
    "path and equals batch") {
    val (store, dir) = newStore()
    seed(store)
    val p = graft.projections.js.JsProjection.compile("""
fromAll()
    .foreachStream()
    .when({
        $init: function() { return { agg: { n: 0, hi: -1 }, keep: 'k' }; },
        $any: function(s, e) {
            s.agg.n += 1;
            s.agg.hi = Math.max(s.agg.hi, e.sequenceNumber);
            return s;
        }
    })""")
    assert(p.compilesToColumns)
    val src = Subscriptions.subscribeAll(spark, s"$dir/log")
      .where(col("stream_id").startsWith("acct-"))
    assert(p.fastStatesStream(src).isDefined)
    val ck = Files.createTempDirectory("jsnestck").toString
    val captured = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val q = p.statesStream(src).writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
        b.collect().foreach { case (k, v) => captured.put(k, v) }: Unit
      }
      .option("checkpointLocation", ck)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val batch = p.states(store.read().where(col("stream_id").startsWith("acct-")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(captured.asScala.toMap == batch)
  }

  test("JS options(reorderEvents): out-of-order arrivals fold in position order") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def le(pos: Long) = graft.projections.LogEvent(
      "m-1", pos, "E", pos, new java.sql.Timestamp(pos * 1000), null,
      s"""{"p":$pos}""", 0.0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.projections.LogEvent]
    // order-dependent fold: concatenates positions in processing order
    val p = graft.projections.js.JsProjection.compile("""
options({ reorderEvents: true, processingLag: 1500 });
fromAll().foreachStream().when({
  $init: function() { return { seq: "" } },
  E: function(s, e) { s.seq = s.seq + e.body.p + ","; return s; }
})""")
    input.addData(le(3), le(1)) // arrival order 3,1
    input.addData(le(2), le(5)) // then 2; 5 advances event time
    val q = p.statesStream(input.toDF())
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("jsreorder").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val state = spark.sql("SELECT state FROM jsreorder ORDER BY state DESC LIMIT 1")
      .collect().headOption.map(_.getString(0))
    // 1,2,3 released (≤ highwater 5000 - lag 1500) in POSITION order
    // despite 3 arriving first; 5 still held in the buffer
    assert(state.contains("""{"seq":"1,2,3,"}"""), state)
  }

  test("windowed streaming agg with watermark equals the batch window agg") {
    val (store, dir) = newStore()
    store.append(Seq(
      PendingEvent("acct-1", "w1", "Deposited", "{}", timestamp = ts("2024-01-01 10:05:00")),
      PendingEvent("acct-1", "w2", "Deposited", "{}", timestamp = ts("2024-01-01 10:40:00")),
      PendingEvent("acct-2", "w3", "Withdrawn", "{}", timestamp = ts("2024-01-01 11:10:00")),
      PendingEvent("acct-2", "w4", "Deposited", "{}", timestamp = ts("2024-01-01 11:59:00"))))
    val s = spark; import s.implicits._
    val withValue = (df: org.apache.spark.sql.DataFrame) => df.withColumn("value", lit(1.0))

    val batch = withValue(store.read())
      .groupBy(window(col("timestamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val q = Subscriptions.windowedAgg(
        withValue(Subscriptions.subscribeAll(spark, s"$dir/log")), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("winagg").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT w_start, event_type, n FROM winagg")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.size == 3) // 10:00 Deposited x2, 11:00 Withdrawn, 11:00 Deposited
  }

  test("streaming session windows (append mode) equal the batch session_window agg") {
    val (store, dir) = newStore()
    store.append(Seq(
      PendingEvent("acct-1", "s1", "Ping", "{}", timestamp = ts("2024-01-01 10:00:00")),
      PendingEvent("acct-1", "s2", "Ping", "{}", timestamp = ts("2024-01-01 10:10:00")),
      PendingEvent("acct-1", "s3", "Ping", "{}", timestamp = ts("2024-01-01 11:30:00")),
      PendingEvent("acct-2", "s4", "Ping", "{}", timestamp = ts("2024-01-01 10:05:00")),
      PendingEvent("acct-3", "s5", "Ping", "{}", timestamp = ts("2024-01-01 15:00:00"))))
    val s = spark; import s.implicits._
    val batch = store.read() // collected BEFORE the acct-9 watermark sentinel lands
      .groupBy(session_window(col("timestamp"), "30 minutes").as("w"), col("stream_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("stream_id"), col("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .toSet
    val ck = java.nio.file.Files.createTempDirectory("sessck").toString
    val out = java.nio.file.Files.createTempDirectory("sessout").toString
    def runOnce(): Unit = {
      val q = Subscriptions.sessionWindowedAgg(
          Subscriptions.subscribeAll(spark, s"$dir/log"), "30 minutes", "1 second")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce() // batch 1: watermark starts at epoch — nothing finalized yet
    // a later arrival advances the watermark past every earlier session end
    store.append(Seq(
      PendingEvent("acct-9", "s6", "Ping", "{}", timestamp = ts("2024-01-01 16:00:00"))))
    runOnce() // restart on the same checkpoint: finalized sessions emit
    val streamed = spark.read.parquet(out)
      .select("w_start", "w_end", "stream_id", "n")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .toSet
    // every session closed by the 16:00 watermark emitted exactly once:
    // acct-1 [10:00,10:40) n=2 (merged) + [11:30,12:00) n=1; acct-2
    // [10:05,10:35) n=1; acct-3 [15:00,15:30) n=1. The 16:00 session
    // itself is still open — withheld in streaming, excluded from batch.
    assert(streamed == batch)
    assert(streamed.size == 4)
    assert(streamed.exists { case (_, _, sid, n) => sid == "acct-1" && n == 2L })
  }

  test("P17 reorderEvents: out-of-order arrival across batches is released in position order") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def le(pos: Long) = graft.projections.LogEvent(
      "m-1", pos, "E", pos, new java.sql.Timestamp(pos * 1000), null, "{}", 0.0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.projections.LogEvent]
    val q = Subscriptions.reorderedStream(input.toDF(), lagPositions = 2)
      .writeStream.format("memory").queryName("reorder").outputMode("append").start()
    // batch 1 arrives out of order: positions 3, 1 → only 1 clears the lag
    input.addData(le(3), le(1))
    q.processAllAvailable()
    // batch 2: positions 2, 5 → high water 5 releases 2 then 3, holds 5
    input.addData(le(2), le(5))
    q.processAllAvailable()
    q.stop()
    val released = spark.sql("SELECT log_position FROM reorder")
      .collect().map(_.getLong(0)).toSeq
    assert(released == Seq(1L, 2L, 3L)) // in position order despite arrival order
  }

  test("P17 reorderEvents by TIME lag (reference processingLag unit, ms)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def le(pos: Long, tsMs: Long) = graft.projections.LogEvent(
      "m-1", pos, "E", pos, new java.sql.Timestamp(tsMs), null, "{}", 0.0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.projections.LogEvent]
    val q = Subscriptions.reorderedStreamByTime(input.toDF(), lagMillis = 500)
      .writeStream.format("memory").queryName("reordertime").outputMode("append").start()
    // t=3000 and t=1000 arrive together: only t=1000 clears the 500 ms lag
    input.addData(le(3, 3000), le(1, 1000))
    q.processAllAvailable()
    // t=2000 (late) and t=5000: high water 5000 releases 2000 and 3000
    input.addData(le(2, 2000), le(5, 5000))
    q.processAllAvailable()
    q.stop()
    val released = spark.sql("SELECT log_position FROM reordertime")
      .collect().map(_.getLong(0)).toSeq
    assert(released == Seq(1L, 2L, 3L))
  }

  test("projection state runs on the RocksDB state store (large-state config)") {
    // same-session override: set the provider for this query's checkpoint
    val (store, dir) = newStore()
    seed(store)
    val s = spark; import s.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Subscriptions.projectionStream[Long](
          Subscriptions.subscribeAll(spark, s"$dir/log")
            .where(col("stream_id").startsWith("acct-")),
          e => Some(e.stream_id), () => 0L, (n, _) => n + 1)
        .writeStream.format("memory").queryName("rocksfold").outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("rockck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val counts = spark.sql("SELECT _1, _2 FROM rocksfold")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("acct-1" -> 2L, "acct-2" -> 1L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("RocksDB checkpoint recovery at many-stream count: restart resumes " +
    "every stream's state, tail folds on top (StateStoreProbe contract)") {
    // reduced-but-representative form of the million-stream soak
    // (graft.tools.StateStoreProbe / BASELINE.md "million-stream state
    // store"): 20k distinct streams build into the RocksDB store, the
    // query stops, a tail touching a subset arrives, and the RESTARTED
    // query must recover every key from the checkpoint — counts equal the
    // batch fold over the full log, never a re-init of untouched streams.
    val s = spark; import s.implicits._
    val n = 20000L
    val root = Files.createTempDirectory("rockrecover").toString
    val logDir = s"$root/log"
    val ck = s"$root/ck"
    def writeChunk(streams: Long, posBase: Long): Unit =
      spark.range(streams).select(
        concat(lit("s-"), col("id")).as("stream_id"),
        lit(0L).as("event_number"),
        concat(lit("e"), col("id") + posBase).as("event_id"),
        lit("E").as("event_type"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"),
        (col("id") + posBase).as("log_position"),
        lit(null).cast("string").as("correlation_id"),
        lit(true).as("is_json"),
        lit("{}").as("data"),
        lit(null).cast("string").as("metadata"),
        lit(1.0).as("value"))
        .repartition(2).write.mode("append").parquet(logDir)
    writeChunk(n, 0L)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runPass(): Unit = {
        val q = Subscriptions.projectionStream[Long](
            spark.readStream.schema(Subscriptions.logSchema(spark, logDir))
              .parquet(logDir),
            e => Some(e.stream_id), () => 0L, (c, _) => c + 1L)
          .writeStream.format("noop")
          .option("checkpointLocation", ck)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(300000)
      }
      runPass() // build 20k states, stop
      writeChunk(500, n) // tail: second event for streams s-0..s-499
      runPass() // RESTART: must recover all 20k keys, fold the tail on top

      // third pass emits nothing new; read back the final states by
      // re-running with a memory sink over a fresh tail of zero rows is
      // moot — instead verify via the state the NEXT tail observes: a
      // touched stream's count keeps its recovered value + 1
      writeChunk(3, n + 500)
      // memory sink cannot resume a checkpoint; foreachBatch can
      val captured = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val q = Subscriptions.projectionStream[Long](
          spark.readStream.schema(Subscriptions.logSchema(spark, logDir))
            .parquet(logDir),
          e => Some(e.stream_id), () => 0L, (c, _) => c + 1L)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
          batch.collect().foreach { case (k, v) => captured.put(k, v) }: Unit
        }
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      import scala.jdk.CollectionConverters._
      val updated = captured.asScala.toMap
      // s-0..s-2 were seen in chunk1 (1) + tail (1) + this batch (1) = 3:
      // only correct if BOTH prior passes' state survived the restarts
      assert(updated == Map("s-0" -> 3L, "s-1" -> 3L, "s-2" -> 3L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming exact dedup: cross-batch duplicates are dropped via state") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = Subscriptions.dedupStream(docs,
        graft.functions.TextFunctions.fingerprint(col("text")), "ts", "1 hour")
      .writeStream.format("memory").queryName("streamdedup").outputMode("append").start()
    val t = ts("2024-01-01 10:00:00")
    input.addData((1L, "alpha beta", t), (2L, "gamma delta", t))
    q.processAllAvailable()
    // batch 2: doc 3 duplicates doc 1 (same normalized text), doc 4 is new
    input.addData((3L, "  Alpha   Beta ", t), (4L, "epsilon zeta", t))
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT doc_id FROM streamdedup")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L)) // 3 deduped against state from batch 1
  }

  test("streaming perplexity + DSIR scoring: per-batch scores union to the " +
    "batch scoring; replayed batches overwrite their own partition") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val train = all.where(col("doc_id") < 40)
    val rows = all.as[(Long, String)].collect().toSeq

    val pplOut = Files.createTempDirectory("pplout").toString + "/scores"
    val pplCk = Files.createTempDirectory("pplck").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = graft.analytics.CorpusStream.perplexityScoreStream(
      in1.toDF().toDF("doc_id", "text"), train, pplOut, pplCk, vocab = 200)
    in1.addData(rows.take(60)); q1.processAllAvailable()
    in1.addData(rows.drop(60)); q1.processAllAvailable()
    q1.stop()
    val streamed = spark.read.parquet(pplOut)
      .select("id", "n_tokens", "log_ppl").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val batch = graft.analytics.Corpus
      .perplexityScores(all, train, vocab = 200).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(streamed == batch, "streamed scores must union to the batch scoring")

    val dsirOut = Files.createTempDirectory("dsirout").toString + "/w"
    val dsirCk = Files.createTempDirectory("dsirck").toString
    val in2 = MemoryStream[(Long, String)]
    val q2 = graft.analytics.CorpusStream.importanceWeightsStream(
      in2.toDF().toDF("doc_id", "text"), target = train, reference = all,
      outDir = dsirOut, checkpoint = dsirCk, buckets = 256)
    in2.addData(rows.take(60)); q2.processAllAvailable()
    in2.addData(rows.drop(60)); q2.processAllAvailable()
    q2.stop()
    val streamedW = spark.read.parquet(dsirOut)
      .select("id", "log_weight").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batchW = graft.analytics.Corpus
      .importanceWeights(all, train, buckets = 256,
        referenceOverride = Some(all))
      .select("id", "log_weight").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamedW == batchW, "streamed weights must union to the batch run")

    val nbOut = Files.createTempDirectory("nbout").toString + "/pred"
    val nbCk = Files.createTempDirectory("nbck").toString
    val model = graft.analytics.Corpus.naiveBayesTrain(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .where(col("doc_id") < 100), "lang", "text", buckets = 256)
    val in3 = MemoryStream[(Long, String)]
    val q3 = graft.analytics.CorpusStream.naiveBayesClassifyStream(
      in3.toDF().toDF("doc_id", "text"), model, nbOut, nbCk, buckets = 256)
    in3.addData(rows.take(60)); q3.processAllAvailable()
    in3.addData(rows.drop(60)); q3.processAllAvailable()
    q3.stop()
    val streamedP = spark.read.parquet(nbOut)
      .select("doc_id", "pred_label", "log_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batchP = graft.analytics.Corpus
      .naiveBayesClassify(all, model, buckets = 256)
      .select("doc_id", "pred_label", "log_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamedP == batchP, "streamed predictions must union to the batch run")
  }

  test("streaming training pipeline: quality gate -> dedup -> token stats, batch == stream") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.functions.TextFunctions

    // the same pipeline stages, as a DataFrame transform usable both ways
    def stages(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs.where(TextFunctions.qualityScore(col("text")) > 0.5)
        .select(col("doc_id"), col("text"), col("ts"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))

    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")).as("ts"))
    // plant a duplicate of doc 0 arriving later
    val dup = base.where(col("doc_id") === 0)
      .select((col("doc_id") + 9999).as("doc_id"), col("text"), col("ts"))

    // batch expectation: quality-filtered, first-arrival dedup by fingerprint
    val batchIds = stages(base.unionAll(dup))
      .withColumn("_fp", TextFunctions.fingerprint(col("text")))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("_fp").orderBy("doc_id")))
      .where(col("_rn") === 1)
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Subscriptions.dedupStream(
        stages(input.toDF().toDF("doc_id", "text", "ts")),
        TextFunctions.fingerprint(col("text")), "ts", "1 hour")
      .writeStream.format("memory").queryName("streampipe").outputMode("append").start()
    val rows = base.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    input.addData(rows.take(rows.length / 2).toSeq)
    q.processAllAvailable()
    input.addData(rows.drop(rows.length / 2).toSeq) // rest + then the dup batch
    q.processAllAvailable()
    input.addData(dup.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSeq)
    q.processAllAvailable()
    q.stop()
    val streamIds = spark.sql("SELECT doc_id FROM streampipe")
      .collect().map(_.getLong(0)).toSet
    assert(streamIds == batchIds)
    assert(!streamIds.contains(10999L)) // the planted dup was dropped by state
  }

  test("P13/P21 streaming emit == batch emit, exactly-once across a restart") {
    val (srcStore, srcDir) = newStore()
    seed(srcStore)
    val outStream = new EventLogStore(spark,
      Files.createTempDirectory("emitS").toString)
    val outBatch = new EventLogStore(spark,
      Files.createTempDirectory("emitB").toString)
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $init: function() { return { n: 0 } },
        Deposited: function(s, e) {
            s.n += 1;
            emit("dep-" + e.streamId, "DepositSeen", { seq: s.n, amt: e.body.amt });
            return s;
        }
    })""")
    val ck = Files.createTempDirectory("emitck").toString
    def runOnce(): Unit = {
      val q = graft.projections.EmittedSink.streamTo(outStream, "deps",
        p.emittedStream(Subscriptions.subscribeAll(spark, s"$srcDir/log")
          .where(col("stream_id").startsWith("acct-"))), ck)
      q.awaitTermination(60000)
    }
    runOnce() // catch-up over the seed
    srcStore.append(Seq(
      PendingEvent("acct-1", "e5", "Deposited", """{"amt":2}"""),
      PendingEvent("acct-2", "e6", "Withdrawn", """{"amt":1}""")))
    runOnce() // RESTART on the same checkpoint: state resumes, tail folds
    // batch reference: the same projection over the full final log
    graft.projections.EmittedSink.appendIdempotent(
      outBatch, "deps", p.emitted(srcStore.read()))
    def dump(st: EventLogStore) = st.read()
      .select("stream_id", "event_number", "event_type", "data", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    val streamed = dump(outStream)
    assert(streamed == dump(outBatch))
    assert(streamed.exists(_._4 == """{"seq":2,"amt":2}""")) // resumed state, not re-inited
    // exactly-once: a FULL batch replay into the streaming target is a
    // no-op — streaming ids are bit-identical to batch ids
    assert(graft.projections.EmittedSink.appendIdempotent(
      outStream, "deps", p.emitted(srcStore.read())) == 0L)
  }

  test("P13 JS compiled: state-free emittedStream is a stateless select " +
    "— no fold operator, rows == batch, exactly-once across a restart") {
    val (srcStore, srcDir) = newStore()
    seed(srcStore)
    val outStream = new EventLogStore(spark,
      Files.createTempDirectory("emitCS").toString)
    val outBatch = new EventLogStore(spark,
      Files.createTempDirectory("emitCB").toString)
    // guarded emit + linkTo, all state-free → the compiled plan needs no
    // state store AT ALL (pure per-row select), unlike the stateful-emit
    // test above which must stay on flatMapGroupsWithState
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $any: function(s, e) {
            if (e.eventType === 'Deposited') {
                emit("dep-" + e.streamId, "DepositSeen", { seq: e.sequenceNumber });
            }
            linkTo("all-acct", e);
        }
    })""")
    assert(p.emitsToColumns)
    val fast = p.fastEmittedStream(
      Subscriptions.subscribeAll(spark, s"$srcDir/log"))
    assert(fast.isDefined, "state-free emissions must take the stateless path")
    val planStr = fast.get.queryExecution.analyzed.toString
    assert(!planStr.contains("FlatMapGroupsWithState"),
      "compiled streaming emit must not fold per key")
    val ck = Files.createTempDirectory("emitcsck").toString
    def runOnce(): Unit = {
      val q = graft.projections.EmittedSink.streamTo(outStream, "cdeps",
        p.emittedStream(Subscriptions.subscribeAll(spark, s"$srcDir/log")), ck)
      q.awaitTermination(60000)
    }
    runOnce() // catch-up over the seed
    srcStore.append(Seq(
      PendingEvent("acct-1", "e7", "Deposited", """{"amt":7}"""),
      PendingEvent("acct-3", "e8", "Opened", """{}""")))
    runOnce() // restart on the same checkpoint: only the tail emits
    graft.projections.EmittedSink.appendIdempotent(
      outBatch, "cdeps", p.emitted(srcStore.read()))
    def dump(st: EventLogStore) = st.read()
      .select("stream_id", "event_number", "event_type", "data", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    val streamed = dump(outStream)
    assert(streamed == dump(outBatch))
    // exactly-once: a full batch replay into the streaming target no-ops
    assert(graft.projections.EmittedSink.appendIdempotent(
      outStream, "cdeps", p.emitted(srcStore.read())) == 0L)
  }

  test("P13/P20 JS STATEFUL emit: emittedStream serves through the typed " +
    "stepper — no interpreter, rows == batch, state crosses micro-batches") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val defs = graft.projections.js.JsProjectionQueries.handlerCorpus.toMap
    val p = graft.projections.js.JsProjection.compile(defs("js_emit_stateful"))
    assert(p.emitsToColumns, "stateful emit must compile (r15 post channel)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.projections.LogEvent]
    // the stateless-select path refuses (windows); the stepper serves it
    assert(p.fastEmittedStream(input.toDF()).isEmpty,
      "a window-bearing emit plan must not stream as a select")
    assert(p.stepperEmittedStream(input.toDF()).isDefined,
      "stateful emit must take the typed stepper path")
    spark.conf.set("spark.graft.js.streamStepper", "false")
    try assert(p.stepperEmittedStream(input.toDF()).isEmpty)
    finally spark.conf.unset("spark.graft.js.streamStepper")

    def le(stream: String, num: Long, pos: Long, v: Double) =
      graft.projections.LogEvent(stream, num, "purchase", pos,
        new java.sql.Timestamp(pos * 1000), null, "{}", v)
    // stream 1 reaches its 5th purchase (milestone) inside batch A;
    // stream 2 reaches its 5th only in batch B — the running count and
    // total must continue across the micro-batch boundary
    val batchA = (0L until 5L).map(i => le("purchase-1", i, i, i + 1.5)) ++
      (0L until 3L).map(i => le("purchase-2", i, 10 + i, 2.25))
    val batchB = (5L until 7L).map(i => le("purchase-1", i, 20 + i, 0.8)) ++
      (3L until 5L).map(i => le("purchase-2", i, 30 + i, 4.1))
    val ck = Files.createTempDirectory("jsemitstepck").toString
    val captured =
      java.util.concurrent.ConcurrentHashMap.newKeySet[graft.projections.Emitted]()
    def runPass(): Set[graft.projections.Emitted] = {
      val q = p.emittedStream(input.toDF()).writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.projections.Emitted], _: Long) =>
            b.collect().foreach(e => captured.add(e)): Unit
        }
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      captured.asScala.toSet
    }
    def batchEmits(rows: Seq[graft.projections.LogEvent]) =
      p.emitted(rows.toDF()).collect().toSet
    input.addData(batchA: _*)
    val pass1 = runPass()
    assert(pass1.nonEmpty, "stream 1's 5th purchase must emit in pass 1")
    assert(pass1 == batchEmits(batchA), "pass 1 must equal batch emitted")
    input.addData(batchB: _*)
    assert(runPass() == batchEmits(batchA ++ batchB),
      "pass 2 — stream 2's milestone must fold state from batch 1")
  }

  test("P21 JS STATEFUL emit: exactly-once through EmittedSink across a " +
    "restart — stepper stream target == batch target, replay no-ops") {
    val (srcStore, srcDir) = newStore()
    seed(srcStore)
    val outStream = new EventLogStore(spark,
      Files.createTempDirectory("emitSfS").toString)
    val outBatch = new EventLogStore(spark,
      Files.createTempDirectory("emitSfB").toString)
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, total: 0 }; },
        Deposited: function(s, e) {
            s.n += 1;
            s.total += Math.round(e.body.amt);
            if (s.n % 2 === 0)
                emit("milestones-" + e.streamId, "Milestone",
                     { n: s.n, total: s.total });
        }
    })""")
    assert(p.emitsToColumns)
    assert(p.stepperEmittedStream(
      Subscriptions.subscribeAll(spark, s"$srcDir/log")).isDefined,
      "stateful emit must stream through the typed stepper")
    val ck = Files.createTempDirectory("emitsfck").toString
    def runOnce(): Unit = {
      val q = graft.projections.EmittedSink.streamTo(outStream, "sfmil",
        p.emittedStream(Subscriptions.subscribeAll(spark, s"$srcDir/log")), ck)
      q.awaitTermination(60000)
    }
    runOnce() // catch-up: acct-1 reaches its 2nd deposit only after the tail
    srcStore.append(Seq(
      PendingEvent("acct-1", "e7", "Deposited", """{"amt":7}"""),
      PendingEvent("acct-2", "e8", "Deposited", """{"amt":2}""")))
    // restart on the same checkpoint: the milestones fire exactly once,
    // with running state carried over from the first pass
    runOnce()
    graft.projections.EmittedSink.appendIdempotent(
      outBatch, "sfmil", p.emitted(srcStore.read()))
    def dump(st: EventLogStore) = st.read()
      .select("stream_id", "event_number", "event_type", "data", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    val streamed = dump(outStream)
    assert(streamed.nonEmpty, "the 2nd deposits must have emitted")
    assert(streamed == dump(outBatch))
    assert(graft.projections.EmittedSink.appendIdempotent(
      outStream, "sfmil", p.emitted(srcStore.read())) == 0L)
  }

  test("P13 Scala DSL emittedStream: linkTo + $created parity with batch emitted") {
    val (store, dir) = newStore()
    seed(store)
    val s = spark; import s.implicits._
    def builder = Projections.fromCategory("acct")
      .foreachStream()
      .init(0L)
      .whenCreated((n, _) => n + 100) // $created fires once per stream
      .whenAnyEmit { (n, e, em) =>
        em.linkTo("all-acct", e)
        if (n >= 100) em.emit("first-seen", "First", s"""{"s":"${e.stream_id}"}""")
        n % 100 + 1
      }
    val batch = builder.emitted(store.read()).collect().toSet
    val q = builder.emittedStream(Subscriptions.subscribeAll(spark, s"$dir/log")).toDF()
      .writeStream.format("memory").queryName("dslemit").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT * FROM dslemit").as[graft.projections.Emitted]
      .collect().toSet
    assert(streamed == batch)
    assert(batch.exists(_.stream_id == "first-seen")) // $created path exercised
  }

  test("SUB3: failing batches are parked (dead-letter), then replayable") {
    val (store, dir) = newStore()
    seed(store)
    val parked = Files.createTempDirectory("parked").toString + "/p"
    val ck = Files.createTempDirectory("ck3").toString
    val q = Subscriptions.withDeadLetter(
      Subscriptions.subscribeAll(spark, s"$dir/log"), ck,
      _ => throw new RuntimeException("consumer down"), parked)
    q.awaitTermination(60000)
    val replayed = Subscriptions.replayParked(spark, parked)
    assert(replayed.count() == 4)
  }

  test("P16 JS bi-state: streaming states equal batch states (exact interleaving)") {
    val (store, dir) = newStore()
    seed(store)
    store.append(Seq(PendingEvent("acct-1", "e5", "Deposited", """{"amt":2}""")))
    // running share: each partition records the shared total AS OF its
    // last event — order-dependent across partitions, so any deviation
    // from the exact interleaving changes the result
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $init: function() { return { bal: 0, totalAt: 0 } },
        $initShared: function() { return { total: 0 } },
        $any: function(states, e) {
            var s = states[0], sh = states[1];
            sh.total += e.body.amt;
            s.bal += e.body.amt;
            s.totalAt = sh.total;
            return [s, sh];
        }
    })""")
    val batch = p.states(store.read()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val q = p.statesStream(
        Subscriptions.subscribeAll(spark, s"$dir/log")
          .where(col("stream_id").startsWith("acct-")))
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("jsbistate").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT partition, state FROM jsbistate").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch.contains(graft.projections.BiStateFold.SharedKey))
    assert(streamed == batch)
  }

  test("P18 JS $deleted: tombstones fire the handler in streaming, stream == batch") {
    val (store, dir) = newStore()
    seed(store)
    store.tombstone("acct-2")
    val p = graft.projections.js.JsProjection.compile("""
fromCategory("acct")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, deleted: false } },
        $any: function(s, e) { s.n += 1; return s; },
        $deleted: function(s, e) { s.deleted = true; return s; }
    })""")
    val batch = p.states(store.read()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch("acct-2").contains("\"deleted\":true"))
    val q = p.statesStream(
        Subscriptions.subscribeAll(spark, s"$dir/log")
          .where(col("stream_id").startsWith("acct-")))
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("jsdeleted").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT partition, state FROM jsdeleted").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }

  test("P16 Scala DSL bi-state statesStream equals batch states") {
    val s0 = spark; import s0.implicits._
    val (store, dir) = newStore()
    seed(store)
    def amt(data: String): Long =
      if (data == null) 0L
      else """"amt":(\d+)""".r.findFirstMatchIn(data).map(_.group(1).toLong).getOrElse(0L)
    def builder = Projections.fromCategory("acct").foreachStream()
      .initBi[(Long, Long)]((0L, 0L), (0L, 0L)) { case ((bal, _), (tot, _), e) =>
        val a = amt(e.data)
        ((bal + a, tot + a), (tot + a, 0L))
      }
    val batch = builder.states(store.read()).collect().toMap
    val q = builder.statesStream(
        Subscriptions.subscribeAll(spark, s"$dir/log")
          .where(col("stream_id").startsWith("acct-")))
      .toDF("partition", "state")
      .writeStream.format("memory").queryName("scalabistate").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT partition, state FROM scalabistate").collect()
      .map(r => r.getString(0) -> (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    assert(streamed == batch)
  }

  test("streaming near-dup resolution == batch resolveNearDups, restart-safe across chunks") {
    val s = spark; import s.implicits._
    import graft.analytics.{Dedup, DedupStream}
    val srcDir = Files.createTempDirectory("nddocs").toString
    val stateDir = Files.createTempDirectory("ndstate").toString
    val ck = Files.createTempDirectory("ndck").toString

    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val chunk1 = Seq(
      (1L, base + " alpha"), (2L, base + " beta"),
      (3L, "completely different text about spark catalyst optimizer internals and codegen"),
      (4L, "yet another unrelated document talking about parquet bloom filters and stats"))
    // 5 near-dups doc 1 ACROSS the restart; 7 near-dups 6 within its own chunk
    val chunk2 = Seq(
      (5L, base + " gamma"),
      (6L, "streaming state stores keep per key state across micro batch boundaries safely"),
      (7L, "streaming state stores keep per key state across micro batch boundaries today"))
    // 0 < 1 dethrones the {1,2,5} representative: batch 1's resolved
    // partition (where doc 1 lives) must be REWRITTEN by a later batch —
    // the touched-component partition-overwrite path
    val chunk3 = Seq((0L, base + " delta"))

    val ix = DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
      textCol = "text", idCol = "doc_id", n = 3)

    def runOnce(): Unit = {
      val q = DedupStream.resolveNearDupsStream(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"))
          .parquet(srcDir),
        stateDir, ck, ix)
      q.awaitTermination(120000)
    }
    chunk1.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    runOnce()
    chunk2.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    runOnce() // RESTART on the same checkpoint: only the new files process
    chunk3.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    runOnce()

    val streamed = DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet
    // the materialized form is the same view, written as plain files
    DedupStream.compactResolved(spark, stateDir)
    val compacted = spark.read.parquet(s"$stateDir/resolved")
      .select("doc_id").as[Long].collect().toSet
    assert(compacted == streamed)
    val all = (chunk1 ++ chunk2 ++ chunk3).toDF("doc_id", "text")
    val batchResolved = Dedup.resolveNearDups(all,
        Dedup.minhashLshPairs(all, 0.5, 16, 8, "text", "doc_id", 3))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batchResolved)
    assert(!streamed.contains(1L) && !streamed.contains(5L), "cross-restart near-dup dropped")
    assert(streamed.contains(0L), "late smaller-id representative kept")
    assert(streamed.contains(6L) && !streamed.contains(7L), "same-chunk near-dup dropped")

    // REPLAY of an already-committed batch (foreachBatch re-delivery when
    // the crash fell between our label commit and the streaming
    // checkpoint's): must be a no-op — in particular it must NOT erase
    // the batch's drops partition by recomputing the delta against the
    // batch's own committed labels
    val lastBatch = (chunk1 ++ chunk2 ++ chunk3).toDF("doc_id", "text")
      .where(col("doc_id") === 0L)
    val dropsBefore = spark.read.parquet(s"$stateDir/drops")
      .select("id", "_batch").collect().map(_.toString).sorted.toSeq
    DedupStream.processBatch(lastBatch, 2L, stateDir, ix, "doc_id")
    val dropsAfter = spark.read.parquet(s"$stateDir/drops")
      .select("id", "_batch").collect().map(_.toString).sorted.toSeq
    assert(dropsAfter == dropsBefore, "replayed committed batch must not rewrite drops")
    assert(DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet == streamed)
  }

  test("streaming cluster-quota admission: lifetime per-cluster caps hold " +
    "across batches and across a restart; earlier arrivals win") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.analytics.{CorpusStream, Similarity}

    // three orthogonal clusters; centroid table = one prototype per cluster
    def vec(c: Int, i: Int): Array[Float] = {
      val v = Array.fill(12)(0.0f); v(c * 4) = 10f; v(c * 4 + 1) = 1f + i * 0.01f; v
    }
    val centroids = Seq(0, 1, 2).map(c =>
      (c, vec(c, 0).map(_.toDouble).toSeq)).toDF("centroid_id", "centv")
    val outDir = Files.createTempDirectory("cqout").toString + "/sample"
    val ck = Files.createTempDirectory("cqck").toString
    val in = MemoryStream[(Long, Array[Float])]
    def start() = CorpusStream.clusterQuotaSampleStream(
      in.toDF().toDF("vec_id", "embedding"), centroids, quota = 2, outDir, ck)

    val q1 = start()
    // batch 1: 3 of cluster 0 (one over quota), 1 of cluster 1
    in.addData((100L, vec(0, 1)), (101L, vec(0, 2)), (102L, vec(0, 3)), (200L, vec(1, 1)))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // RESTART on the same checkpoint: quotas must persist
    // batch 2: 2 more of cluster 0 (cluster full -> rejected),
    // 2 of cluster 1 (one admitted), 1 of cluster 2
    in.addData((103L, vec(0, 4)), (104L, vec(0, 5)),
      (201L, vec(1, 2)), (202L, vec(1, 3)), (300L, vec(2, 1)))
    q2.processAllAvailable(); q2.stop()

    val q3 = start()
    // batch 3: id 300 is RE-DELIVERED (reprocessed ingest) while its
    // cluster still has room — it must not be admitted or emitted twice;
    // 301 takes the remaining slot
    in.addData((300L, vec(2, 1)), (301L, vec(2, 2)))
    q3.processAllAvailable(); q3.stop()

    val rows = spark.read.parquet(outDir).as[(Long, Int)].collect().toSeq
    assert(rows.size == rows.toMap.size, "an id was emitted more than once")
    val out = rows.toMap
    val perList = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perList(0) == 2 && perList(1) == 2 && perList(2) == 2, perList.toString)
    assert(out.contains(300L) && out.contains(301L))
    // cluster 0 filled ENTIRELY from batch 1 (first arrival wins): the
    // restart must not re-open the quota for batch 2's 103/104
    assert(Set(103L, 104L).forall(!out.contains(_)),
      "restart re-opened an exhausted cluster quota")
    assert(out.keySet.subsetOf(Set(100L, 101L, 102L, 200L, 201L, 202L, 300L, 301L)))
    // assignment is by nearest centroid: admitted ids carry their cluster
    out.foreach { case (id, list) => assert(list == (id / 100 - 1).toInt) }
  }

  test("streaming near-dup: an all-empty stream resolves to an empty corpus") {
    val s = spark; import s.implicits._
    import graft.analytics.DedupStream
    val dir = Files.createTempDirectory("dsempty").toString
    // state dir with docs/ present but holding no data files (the shape
    // dynamic partitionBy leaves after zero-row batches)
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/docs"))
    assert(DedupStream.resolvedCorpus(spark, dir).count() == 0)
  }

  test("stream-stream interval join (native, watermarked) == batch intervalJoin") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the streaming face of range_join_window: Structured Streaming's
    // native stream-stream inner join with an event-time range condition
    // and watermarks IS the interval join — state eviction bounded by the
    // watermark, exactly what a continuous attribution pipeline runs
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cDf = clicks.toDF().toDF("click_id", "c_user", "cts")
      .withWatermark("cts", "10 minutes")
    val pDf = purchases.toDF().toDF("purchase_id", "p_user", "pts")
      .withWatermark("pts", "10 minutes")
    val joined = cDf.join(pDf,
      col("c_user") === col("p_user") &&
        col("cts") >= col("pts") &&
        col("cts") < col("pts") + expr("INTERVAL 30 MINUTES"))
    val q = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("streamrange").outputMode("append").start()
    // purchases at :00 (u1) and :05 (u2); clicks inside and outside windows,
    // arriving across separate micro-batches and out of order
    purchases.addData((100L, 1L, t(0)), (200L, 2L, t(5)))
    clicks.addData((1L, 1L, t(10)), (2L, 2L, t(4)))  // 2L precedes u2's purchase
    q.processAllAvailable()
    clicks.addData((3L, 1L, t(29)), (4L, 1L, t(31)), (5L, 2L, t(20))) // 4L past window
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT click_id, purchase_id FROM streamrange")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: the same windows through Temporal.intervalJoin on µs
    val allClicks = Seq((1L, 1L, t(10)), (2L, 2L, t(4)), (3L, 1L, t(29)),
      (4L, 1L, t(31)), (5L, 2L, t(20))).toDF("click_id", "user_id", "cts")
      .select(col("click_id"), col("user_id"), unix_micros(col("cts")).as("ts_us"))
    val allPurch = Seq((100L, 1L, t(0)), (200L, 2L, t(5))).toDF("purchase_id", "user_id", "pts")
      .select(col("purchase_id"), col("user_id"), unix_micros(col("pts")).as("s"),
        (unix_micros(col("pts")) + 30L * 60 * 1000000).as("e"))
    val batch = graft.operators.Temporal.intervalJoin(allClicks, allPurch,
        Seq("user_id"), "ts_us", "s", "e", Seq("purchase_id"), blockSize = 1800000000L)
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 100L), (3L, 100L), (5L, 200L)))
  }

  test("streaming near-dup resolution survives batches with zero pairs (empty edge partitions)") {
    val s = spark; import s.implicits._
    import graft.analytics.{Dedup, DedupStream}
    val srcDir = Files.createTempDirectory("nddocs0").toString
    val stateDir = Files.createTempDirectory("ndstate0").toString
    val ck = Files.createTempDirectory("ndck0").toString
    val uniques = Seq(
      (1L, "entirely unique first document about catalyst optimizer rules"),
      (2L, "second document all about parquet row group statistics pruning"),
      (3L, "third text concerning shuffle partition coalescing under aqe"))
    uniques.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val q = DedupStream.resolveNearDupsStream(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"))
        .parquet(srcDir),
      stateDir, ck,
      DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
        textCol = "text", idCol = "doc_id", n = 3))
    q.awaitTermination(120000)
    // zero pairs => empty drops partitions; the corpus passes through intact
    val resolved = DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet
    assert(resolved == Set(1L, 2L, 3L))
  }

  test("streaming near-dup with compaction cadence == batch; folded partitions removed; " +
    "replay after compaction is a no-op") {
    val s = spark; import s.implicits._
    import graft.analytics.{Dedup, DedupStream}
    val srcDir = Files.createTempDirectory("ndcdocs").toString
    val stateDir = Files.createTempDirectory("ndcstate").toString
    val ck = Files.createTempDirectory("ndcck").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val chunks = Seq(
      Seq((1L, base + " alpha"), (2L, base + " beta"),
        (3L, "completely different text about spark catalyst optimizer internals and codegen")),
      Seq((5L, base + " gamma"),
        (6L, "streaming state stores keep per key state across micro batch boundaries safely"),
        (7L, "streaming state stores keep per key state across micro batch boundaries today")),
      // 0 dethrones {1,2,5}'s representative AFTER a compaction has folded
      // those docs' postings into the indexc snapshot — the probe must
      // find the historical partners through the compacted view
      Seq((0L, base + " delta")))
    val ix = DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
      textCol = "text", idCol = "doc_id", n = 3)
    def runOnce(): Unit = {
      val q = DedupStream.resolveNearDupsStream(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"))
          .parquet(srcDir),
        stateDir, ck, ix, compactEvery = 1) // fold after EVERY batch
      q.awaitTermination(120000)
    }
    chunks.foreach { c =>
      c.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
      runOnce()
    }
    def batchDirs(sub: String): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$stateDir/$sub")
      if (!Files.exists(p)) Seq.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_batch=")).toList
        finally st.close()
      }
    }
    // every processed batch was folded: no per-batch partitions remain,
    // committed snapshots exist
    for (sub <- Seq("index", "sketch", "drops"))
      assert(batchDirs(sub).isEmpty, s"$sub still holds folded per-batch partitions")
    for (sub <- Seq("indexc", "sketchc", "dropsc"))
      assert(Files.exists(java.nio.file.Paths.get(s"$stateDir/$sub/_committed_2")),
        s"$sub snapshot not committed at the last batch")
    val streamed = DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchResolved = Dedup.resolveNearDups(all,
        Dedup.minhashLshPairs(all, 0.5, 16, 8, "text", "doc_id", 3))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batchResolved)
    assert(streamed.contains(0L) && !streamed.contains(1L) && !streamed.contains(5L),
      "post-compaction batch failed to probe folded postings")
    // replay of a committed batch with compaction enabled: still a no-op
    val drops0 = DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet
    DedupStream.processBatch(chunks(2).toDF("doc_id", "text"), 2L, stateDir, ix,
      "doc_id", compactEvery = 1)
    assert(DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet == drops0)
    // explicit maintenance call on already-compacted state: idempotent
    DedupStream.compactState(spark, stateDir)
    assert(DedupStream.resolvedCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet == drops0)
  }

  test("findNearDups serving path: matches indexed near-dups through the compacted " +
    "snapshot; novel queries match nothing; resolvedOnly excludes dropped members") {
    val s = spark; import s.implicits._
    import graft.analytics.DedupStream
    val stateDir = Files.createTempDirectory("ndquery").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val ix = DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
      textCol = "text", idCol = "doc_id", n = 3)
    DedupStream.processBatch(Seq(
      (1L, base + " alpha"), (2L, base + " beta"),
      (3L, "completely different text about spark catalyst optimizer internals and codegen"))
      .toDF("doc_id", "text"), 0L, stateDir, ix, "doc_id")
    // fold everything into the snapshots so the lookup exercises the
    // compacted pushdown path, not just the per-batch tail
    DedupStream.compactState(spark, stateDir)
    val queries = Seq(
      (100L, base + " gamma"),
      (101L, "a wholly novel sentence with no counterpart in the indexed corpus at all"))
      .toDF("doc_id", "text")
    def matches(resolvedOnly: Boolean): Map[Long, Set[Long]] =
      DedupStream.findNearDups(spark, stateDir, queries, ix, resolvedOnly)
        .select("query_id", "match_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = matches(resolvedOnly = false)
    assert(all.getOrElse(100L, Set.empty) == Set(1L, 2L),
      s"query 100 should match both indexed near-dups, got $all")
    assert(!all.contains(101L), "novel text must match nothing")
    // component {1,2} resolved to representative 1 — with resolvedOnly
    // the dropped member 2 is excluded
    val res = matches(resolvedOnly = true)
    assert(res.getOrElse(100L, Set.empty) == Set(1L), s"resolvedOnly got $res")
    // scores pass the indexer threshold
    val scores = DedupStream.findNearDups(spark, stateDir, queries, ix)
      .select("score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(_ >= 0.5))
  }

  test("incremental near-dup resolution is indexer-generic: SimHash and " +
    "embedding sign-LSH families stream == one-shot batch") {
    val s = spark; import s.implicits._
    import graft.analytics.{Dedup, DedupStream, Similarity}
    // --- SimHash family over documents ---
    val base = "the quick brown fox jumps over the lazy dog and then naps in warm afternoon sun"
    val docsAll = Seq(
      (1L, base), (2L, base + " extra"), (5L, base),
      (3L, "a wholly different text about catalyst expression codegen internals"),
      (4L, "yet another unrelated document describing parquet column chunk layout"))
    val shIx = DedupStream.SimHashIndexer(maxHamming = 3, bands = 4,
      textCol = "text", idCol = "doc_id")
    val shState = Files.createTempDirectory("ndsh").toString
    DedupStream.processBatch(docsAll.take(2).toDF("doc_id", "text"), 0L, shState, shIx, "doc_id")
    DedupStream.compactState(spark, shState)
    DedupStream.processBatch(docsAll.drop(2).toDF("doc_id", "text"), 1L, shState, shIx, "doc_id")
    val shStreamed = DedupStream.resolvedCorpus(spark, shState)
      .select("doc_id").as[Long].collect().toSet
    val allDf = docsAll.toDF("doc_id", "text")
    val shPairs = Dedup.simhashNearDupPairs(allDf, maxHamming = 3, bands = 4,
      "text", "doc_id").select("id_a", "id_b")
    val shBatch = Dedup.resolveNearDups(allDf, shPairs)
      .select("doc_id").as[Long].collect().toSet
    assert(shStreamed == shBatch, s"simhash stream=$shStreamed batch=$shBatch")
    assert(shStreamed.contains(1L) && !shStreamed.contains(5L),
      "identical doc 5 must resolve away to representative 1")
    // --- embedding sign-LSH family ---
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(d => math.sin(seed * 17 + d).toFloat)
    val vecsAll = Seq(
      (1L, vec(1)), (2L, vec(1)), (3L, vec(2)), (4L, vec(3)), (5L, vec(2)))
    val embIx = DedupStream.CosineLshIndexer(threshold = 0.9, planes = 4,
      tables = 2, idCol = "vec_id", vecCol = "embedding")
    val embState = Files.createTempDirectory("ndemb").toString
    DedupStream.processBatch(vecsAll.take(3).toDF("vec_id", "embedding"), 0L,
      embState, embIx, "vec_id")
    DedupStream.compactState(spark, embState)
    DedupStream.processBatch(vecsAll.drop(3).toDF("vec_id", "embedding"), 1L,
      embState, embIx, "vec_id")
    val embStreamed = DedupStream.resolvedCorpus(spark, embState, "vec_id")
      .select("vec_id").as[Long].collect().toSet
    val vecsDf = vecsAll.toDF("vec_id", "embedding")
    val embPairs = Similarity.lshNearDupPairsBanded(vecsDf, 0.9, planes = 4,
      tables = 2, "vec_id", "embedding").select("id_a", "id_b")
    val embBatch = Dedup.resolveNearDups(vecsDf, embPairs, idCol = "vec_id")
      .select("vec_id").as[Long].collect().toSet
    assert(embStreamed == embBatch, s"emb stream=$embStreamed batch=$embBatch")
    assert(!embStreamed.contains(2L) && !embStreamed.contains(5L),
      "identical vectors 2 and 5 must resolve away")
  }

  test("streaming near-dup: schema marker gives the all-empty resolved view the real shape") {
    val s = spark; import s.implicits._
    import graft.analytics.DedupStream
    val stateDir = Files.createTempDirectory("ndschema").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    DedupStream.processBatch(empty, 0L, stateDir,
      DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
        textCol = "text", idCol = "doc_id", n = 3), "doc_id")
    val resolved = DedupStream.resolvedCorpus(spark, stateDir)
    assert(resolved.schema.fieldNames.toSeq == Seq("doc_id", "text"),
      "all-empty resolved view lost the document schema")
    assert(resolved.count() == 0)
  }
}
