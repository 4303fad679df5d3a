package graft.projections.js
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RaiseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    val withRaise = df.select(
      when(col("x") > 100, raise_error(lit("boom")).cast("int"))
        .otherwise(col("x")).as("y"))
    withRaise.write.mode("overwrite").format("noop").save()
    println("[raiseprobe] with raise_error WSC: " +
      "WholeStageCodegen".r.findAllIn(withRaise.queryExecution.executedPlan.toString).length)
    val plain = df.select((col("x") + 1).as("y"))
    plain.write.mode("overwrite").format("noop").save()
    println("[raiseprobe] plain WSC: " +
      "WholeStageCodegen".r.findAllIn(plain.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
