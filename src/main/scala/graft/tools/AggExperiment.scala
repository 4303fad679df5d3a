package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: compare exact-sum formulations for q1-style money aggregates. */
object AggExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables.lineitem(spark, sfDir)

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.write.mode("overwrite").format("noop").save())
      println(f"[agg] $name: ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }

    // current: decimal casts + decimal multiply
    time("decimal") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,0)") - col("l_discount").cast("decimal(12,2)"))).cast("double").as("sum_disc_price"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }

    // long cents: round to integer cents first, sum longs, rescale
    time("long-cents") {
      val qty = round(col("l_quantity") * 100).cast("long")
      val price = round(col("l_extendedprice") * 100).cast("long")
      val disc = round(col("l_discount") * 100).cast("long")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(qty) / 100.0).as("sum_qty"),
          (sum(price) / 100.0).as("sum_base_price"),
          (sum(price * (lit(100L) - disc)) / 10000.0).as("sum_disc_price"),
          (sum(disc) / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }

    // long cents, decimal final sum (overflow-safe at any scale)
    time("cents-decimal-sum") {
      val qty = round(col("l_quantity") * 100).cast("long")
      val price = round(col("l_extendedprice") * 100).cast("long")
      val disc = round(col("l_discount") * 100).cast("long")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(qty.cast("decimal(28,0)")) / 100.0).cast("double").as("sum_qty"),
          (sum(price.cast("decimal(28,0)")) / 100.0).cast("double").as("sum_base_price"),
          (sum((price * (lit(100L) - disc)).cast("decimal(28,0)")) / 10000.0).cast("double").as("sum_disc_price"),
          (sum(disc.cast("decimal(28,0)")).cast("double") / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }

    // plain double (inexact reference point: the speed ceiling)
    time("double") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    spark.stop()
  }
}
