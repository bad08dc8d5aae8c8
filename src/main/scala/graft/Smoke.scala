package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry must return >0 rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.ops.Exprs.sessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(50, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
