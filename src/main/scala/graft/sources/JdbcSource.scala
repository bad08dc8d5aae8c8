package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source slice (reference: truthound `execution/pushdown/` +
  * `pushdown_support.py:372-398` — the reference batches all of a suite's
  * metric SQL into one round-trip per table against sqlite/duckdb/
  * postgres).
  *
  * Spark-first shape: register the database as a DataSource-V2
  * `JDBCTableCatalog` with aggregate/filter/limit pushdown enabled. The
  * fused single-Aggregate metric pass the SuiteRunner already emits then
  * compiles into ONE pushed-down SQL statement (`PushedAggregates` /
  * `PushedFilters` visible in the physical plan) — the database computes
  * partial aggregates; Spark transfers one row per partition, not the
  * table. That is the same one-round-trip contract as the reference,
  * expressed through Catalyst instead of a custom SQL builder.
  *
  * Derby (embedded, ships with Spark) is the test backend; any JDBC url +
  * driver works the same way. */
object JdbcSource {

  /** Route Derby's engine log away from the working directory and — more
    * importantly — away from the process stdout/stderr the bench driver
    * captures. Must run before the Derby engine boots (first connection in
    * the JVM), so every entry point below calls it first. Idempotent. */
  def quietDerby(): Unit =
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        System.getProperty("java.io.tmpdir") + "/graft_derby.log")

  /** Register `name` as a DSv2 JDBC catalog with pushdown enabled. */
  def registerCatalog(spark: SparkSession, name: String, url: String,
      driver: String = "org.apache.derby.iapi.jdbc.AutoloadedDriver"): Unit = {
    quietDerby()
    val p = s"spark.sql.catalog.$name"
    spark.conf.set(p,
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"$p.url", url)
    spark.conf.set(s"$p.driver", driver)
    spark.conf.set(s"$p.pushDownAggregate", "true")
    spark.conf.set(s"$p.pushDownLimit", "true")
  }

  /** DSv2 table handle `catalog.schema.table` — scans route through the
    * pushdown-capable JDBCScanBuilder. */
  def table(spark: SparkSession, catalog: String, schema: String,
      tbl: String): DataFrame =
    spark.table(s"$catalog.$schema.$tbl")

  /** Load a bounded slice of a DataFrame into an embedded Derby table
    * (test/demo helper: batched inserts, drop-and-recreate semantics). */
  def loadIntoDerby(df: DataFrame, url: String, tbl: String,
      ddlCols: String, maxRows: Int): Unit = {
    quietDerby()
    val rows = df.limit(maxRows).collect()
    val cols = df.columns
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // Probe existence via JDBC metadata rather than try/DROP — a failed
      // DROP makes Derby print a full parser stack trace, which pollutes
      // the stdout tail the bench driver parses.
      val Array(schemaPart, tblPart) = tbl.split("\\.", 2) match {
        case a if a.length == 2 => a
        case a                  => Array(null, a(0))
      }
      val rs = conn.getMetaData.getTables(null, schemaPart, tblPart, null)
      val exists = rs.next(); rs.close()
      if (exists) st.executeUpdate(s"DROP TABLE $tbl")
      st.executeUpdate(s"CREATE TABLE $tbl ($ddlCols)")
      st.close()
      val ps = conn.prepareStatement(
        s"INSERT INTO $tbl VALUES (${cols.map(_ => "?").mkString(",")})")
      conn.setAutoCommit(false)
      rows.foreach { r =>
        cols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
        ps.addBatch()
      }
      ps.executeBatch()
      conn.commit()
      ps.close()
    } finally conn.close()
  }
}
