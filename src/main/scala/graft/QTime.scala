package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries against a data dir.
  *
  *   runMain graft.QTime <sfDir> <queryPrefixOrName> [more...]
  *
  * Same session settings + warm protocol as graft.Bench (untimed
  * warm-up, two timed runs, min reported) so numbers are comparable to
  * BENCH anchors without paying a full 100+-query sweep while iterating
  * on one plan. */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <query...>")
    val sfDir = args(0)
    val wanted = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Exprs.sizedDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")),
      sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Exprs.quietNoisyLoggers()
    // warm-up read (partial scale dirs may omit lineitem — fall back)
    scala.util.Try(graft.ops.Exprs.table(spark, sfDir, "lineitem").count())
      .getOrElse(graft.ops.Exprs.table(spark, sfDir, "orders").count())
    wanted.foreach { w =>
      SparkEntry.queries.filter(_._1.startsWith(w)).toSeq.sortBy(_._1)
        .foreach { case (name, fn) =>
          def timed(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val best = math.min(timed(), timed())
          println(f"[qtime] $name%-28s $best%8.3f s")
        }
    }
    spark.stop()
  }
}
