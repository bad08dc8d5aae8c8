package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for SparkEntry queries.
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <queryPrefix...>
  *
  * Writes <outDir>/<queryName>_<suffix>.txt for every catalog query whose
  * name starts with one of the prefixes. Same session settings as Bench so
  * the plan (AQE initial plan, join strategies, PushedFilters) matches what
  * the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query...>")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val wanted = args.drop(3)
    java.nio.file.Files.createDirectories(outDir)
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
    wanted.foreach { w =>
      SparkEntry.queries.filter(_._1.startsWith(w)).toSeq.sortBy(_._1)
        .foreach { case (name, fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            outDir.resolve(s"${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
        }
    }
    spark.stop()
  }
}
