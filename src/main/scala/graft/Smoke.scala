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

    // checkpoint + reporter surface: run a real checkpoint with console
    // and workspace-persist actions against sf0.001 lineitem
    import graft.validators._
    import graft.checkpoint._
    val ws = sys.env.getOrElse("GRAFT_WORKSPACE", "/tmp/graft-workspace")
    val runId = s"smoke-${System.currentTimeMillis()}"
    val cp = Checkpoint("lineitem-smoke",
      () => graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "lineitem"),
      Seq(UniqueCheck(Seq("l_orderkey", "l_linenumber")),
          RangeCheck("l_quantity", Some(1), Some(45)),
          TrendCheck("l_shipdate", "l_quantity", -1.0, 1.0)),
      actions = Seq(
        ActionRule(ConsoleAction()),
        ActionRule(PersistAction(ws, runId),
          when = s => s != CheckpointStatus.Error)))
    val cr = cp.run()
    println(s"[smoke] checkpoint status=${cr.status} elapsed=${cr.elapsedMillis}ms" +
      cr.error.map(e => s" error=$e").getOrElse(""))

    // run-history store + data-docs site: persist the checkpoint result,
    // then render the browsable index (links the per-run report the
    // PersistAction wrote plus this run's history row)
    val store = graft.stores.ResultStore(ws)
    cr.result.foreach(r =>
      store.save(spark, r, runId, System.currentTimeMillis()))
    val idx = graft.reporters.Reporters.dataDocsSite(spark, store, ws)
    println(s"[smoke] datadocs index=$idx")
    spark.stop()
  }
}
