package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

object ParseProbe {
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
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("baseline count cols")(log.select(col("stream_id")).write.mode("overwrite").format("noop").save())
    t("try_parse_json")(log.select(try_parse_json(col("data")).as("v")).write.mode("overwrite").format("noop").save())
    t("parse+variant_get")(log.select(try_variant_get(try_parse_json(col("data")), "$.k", "variant").as("v")).write.mode("overwrite").format("noop").save())
    t("parse+get+schema+key")({
      val v = try_variant_get(try_parse_json(col("data")), "$.k", "variant")
      val tcol = schema_of_variant(v)
      val key = when(v.isNull || is_variant_null(v), lit(null).cast("string"))
        .when(tcol === "STRING", try_variant_get(v, "$", "string"))
        .when(tcol === "BIGINT" || tcol === "DOUBLE" || tcol.startsWith("DECIMAL"),
          graft.functions.JsNumberString(try_variant_get(v, "$", "double")))
        .otherwise(lit(null).cast("string"))
      log.select(key.as("k")).write.mode("overwrite").format("noop").save()
    })
    t("get_json_object")(log.select(get_json_object(col("data"), "$.k")).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
