package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.write.mode("overwrite").format("noop").save()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
