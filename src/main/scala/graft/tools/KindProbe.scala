package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object KindProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq("""{"sender":"Ronan","n":5,"b":true,"x":1.5,"arr":[1],"o":{"a":1}}""")
      .toDF("data")
    val v = try_parse_json(col("data"))
    df.select(
      graft.functions.JsVariantKind(v).as("whole"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.sender", "variant")).as("sender"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.n", "variant")).as("n"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.b", "variant")).as("b"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.x", "variant")).as("x"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.arr", "variant")).as("arr"),
      graft.functions.JsVariantKind(try_variant_get(v, "$.o", "variant")).as("o"),
      schema_of_variant(try_variant_get(v, "$.sender", "variant")).as("schema_sender")
    ).show(false)
    spark.stop()
  }
}
