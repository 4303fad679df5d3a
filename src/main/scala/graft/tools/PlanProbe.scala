package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.eventLog(spark, "/root/testdata/sf0.1")
    val log = (0 until 10).map { i =>
      base.withColumn("stream_id", concat(col("stream_id"), lit(s"~$i")))
    }.reduce(_ unionByName _).persist()
    log.write.mode("overwrite").format("noop").save()
    val src = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        $any: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""
    val p = JsProjection.compile(src)
    val df = p.states(log)
    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("js_partition_by states")(df.write.mode("overwrite").format("noop").save())
    val fp = df.queryExecution.executedPlan.toString
    println("[plan-wsc] WholeStageCodegen spans: " +
      "WholeStageCodegen".r.findAllIn(fp).length)
    // hand-written lean equivalent of the key + fold, for the floor
    t("hand-written key+fold")({
      val v = try_variant_get(try_parse_json(col("data")), "$.k", "variant")
      val tt = schema_of_variant(v)
      val key = when(tt === "STRING", try_variant_get(v, "$", "string"))
        .when(tt === "BIGINT" || tt === "DOUBLE" || tt.startsWith("DECIMAL"),
          graft.functions.JsNumberString(try_variant_get(v, "$", "double")))
        .otherwise(lit(null).cast("string"))
      log.select(key.as("k"), col("value"))
        .where(col("k").isNotNull)
        .groupBy(col("k"))
        .agg(sum(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .write.mode("overwrite").format("noop").save()
    })

    def defWithKey(fn: String) = JsProjection.compile(s"""
fromAll()
    .partitionBy($fn)
    .when({
        $$init: function() { return { n: 0 } },
        $$any: function(s, e) { s.n += 1; return s; }
    })""")
    t("key=streamId")(defWithKey("function(e) { return e.streamId; }")
      .states(log).write.mode("overwrite").format("noop").save())
    t("key=body.k bare")(defWithKey("function(e) { return e.body.k; }")
      .states(log).write.mode("overwrite").format("noop").save())
    t("key=guarded ternary")(defWithKey(
      "function(e) { return e.body && e.body.k != null ? e.body.k : null; }")
      .states(log).write.mode("overwrite").format("noop").save())
    spark.stop()

  }
}
