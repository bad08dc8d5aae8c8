package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-JVM interleaved A/B of the ngramLogProbs stream-join
  * configuration (level broadcast gate / shuffled-hash levels) at a
  * given order.
  *
  *   runMain graft.LmProbe <sfDir> <order> <runs> <cfg...>
  *
  * Each cfg is `key=val[;key=val...]`; bare keys get the spark.graft.
  * prefix (e.g. `lmShuffledHash=false;lmBroadcastRows=0`). Configs are
  * INTERLEAVED per round (cfg1, cfg2, cfg1, cfg2, ...) so a host stall
  * wave hits all arms alike; the timed action is a noop-sink write
  * (guide §1.4 — computes every output column, unlike count()). */
object LmProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: LmProbe <sfDir> <order> <runs> <cfg...>")
    val sfDir = args(0)
    val order = args(1).toInt
    val runs = args(2).toInt
    val configs = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Exprs.sizedDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")),
      sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Exprs.quietNoisyLoggers()
    val docs = graft.ops.Exprs.table(spark, sfDir, "documents")
    docs.count() // warm-up: JVM + file listing, untimed
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to runs; cfg <- configs) {
      cfg.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(if (k.contains(".")) k else s"spark.graft.$k", v)
      }
      val t0 = System.nanoTime()
      graft.pipeline.Text.ngramLogProbs(docs, "doc_id", "text",
          order = order, minCount = 2L)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      best(cfg) = math.min(best.getOrElse(cfg, Double.MaxValue), s)
      println(f"[lmprobe] order=$order run=$r cfg=$cfg $s%8.2f s")
    }
    configs.foreach(c =>
      println(f"[lmprobe] MIN order=$order cfg=$c ${best(c)}%8.2f s"))
    spark.stop()
  }
}
