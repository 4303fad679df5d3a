package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{EventLogStore, PendingEvent}
import graft.streaming.Subscriptions
import graft.projections.Projections
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("demo").toString
    val store = new EventLogStore(spark, dir)
    store.append(Seq(
      PendingEvent("acct-1", "a", "Deposited", """{"amt":10}"""),
      PendingEvent("acct-1", "b", "Withdrawn", """{"amt":4}"""),
      PendingEvent("acct-2", "c", "Deposited", """{"amt":7}""")))
    println("LOG:")
    store.read().orderBy("log_position").show(false)
    store.setMetadata("acct-1", maxCount = Some(1L))
    println("RETAINED AFTER maxCount=1 on acct-1:")
    store.readRetained().orderBy("log_position").show(false)
    // streaming subscription end-to-end
    val q = Subscriptions.subscribeAll(spark, s"$dir/log", col("event_type") === "Deposited")
      .writeStream.format("memory").queryName("demo").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("SUBSCRIPTION (Deposited only):")
    spark.sql("SELECT stream_id, event_id, event_type FROM demo ORDER BY event_id").show(false)
    // projection fold over the store
    val bal = Projections.fromCategory("acct").foreachStream().init(0L)
      .when("Deposited")((s, e) => s + """"amt":(\d+)""".r.findFirstMatchIn(e.data).get.group(1).toLong)
      .when("Withdrawn")((s, e) => s - """"amt":(\d+)""".r.findFirstMatchIn(e.data).get.group(1).toLong)
      .states(store.read())
    println("BALANCES:"); bal.toDF("stream", "balance").orderBy("stream").show(false)
    // probe: double-tombstone + append-after-tombstone
    store.tombstone("acct-2")
    try { store.append(Seq(PendingEvent("acct-2", "z", "Deposited", "{}"))); println("PROBE FAIL: append to tombstoned succeeded") }
    catch { case e: Throwable => println("PROBE OK: " + e.getMessage) }
    spark.stop()
  }
}
