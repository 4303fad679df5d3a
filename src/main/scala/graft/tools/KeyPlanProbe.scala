package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

object KeyPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.eventLog(spark, "/root/testdata/sf0.001")
    val p = JsProjection.compile("""
fromAll()
    .partitionBy(function(e) { return e.body && e.body.k != null ? e.body.k : null; })
    .when({
        $init: function() { return { n: 0 } },
        $any: function(s, e) { s.n += 1; return s; }
    })""")
    val df = p.states(base)
    val plan = df.queryExecution.optimizedPlan.toString
    println("[keyplan-size] optimized plan chars: " + plan.length)
    for ((line, i) <- plan.linesIterator.zipWithIndex)
      println(f"[keyplan] L$i%02d len=${line.length}%7d : ${line.take(200)}")
    spark.stop()
  }
}
