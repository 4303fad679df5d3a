package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DropProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val log = Seq(
      ("chat-1", 0L, "ChatMessage", 1L, """{"sender":"Ronan"}"""),
      ("chat-1", 1L, "ChatMessage", 2L, """{"sender":"James"}"""),
      ("chat-2", 0L, "ChatMessage", 3L, """{"sender":"Ronan"}"""),
      ("chat-2", 1L, "ChatMessage", 4L, """{"sender":"Rob"}"""),
      ("chat-2", 2L, "Other", 5L, """{"nosender":1}"""))
      .toDF("stream_id", "event_number", "event_type", "log_position", "data")
      .withColumn("value", lit(0.0))
      .withColumn("timestamp", expr("timestamp_millis(1583035425678)"))
      .withColumn("correlation_id", lit(null).cast("string"))
    val p = JsProjection.compile("""
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.sender != null ? e.body.sender : null;
    })
    .when({
        $init: function() { return { n: 0 } },
        $any: function(s, e) { s.n += 1; return s; }
    })""")
    println("[drop] compiles=" + p.compilesToColumns)
    p.states(log).show(10, false)
    for (line <- p.states(log).queryExecution.analyzed.toString.linesIterator)
      println("[an] " + line.take(8000))
    p.states(log).queryExecution.optimizedPlan.foreach {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        println("[drop] LocalRelation rows=" + l.data.length +
          " sample=" + l.data.take(6).mkString(";"))
      case _ => ()
    }
    spark.conf.set("spark.graft.js.columnCompile", "false")
    println("[drop] interp:")
    p.states(log).show(10, false)
    spark.conf.set("spark.graft.js.columnCompile", "true")
    spark.stop()
  }
}
