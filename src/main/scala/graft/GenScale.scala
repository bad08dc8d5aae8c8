package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replicate the driver's sf0.1 test tables by an integer factor to
  * produce larger bench fixtures (sf1 = factor 10), preserving the star
  * schema's FK structure:
  *
  *   - region/nation copy unchanged (fixed dimensions);
  *   - every fact/dim key shifts by `replica * (max(key)+1)`, applied
  *     consistently on both sides of each FK (orders.o_custkey shifts with
  *     customer.c_custkey, lineitem.l_orderkey with orders.o_orderkey, …),
  *     so orphan ratios, join fan-outs and group cardinalities scale
  *     linearly like a real bigger dataset;
  *   - events keep their distribution; event ids/user ids shift, ts gets a
  *     +replica µs offset to break exact ties. ts is normalized on read by
  *     Exprs.normalizeTs (the same shim the query loader uses) and written
  *     back as TIMESTAMP_NTZ to match the driver fixture's physical type,
  *     so ladder runs exercise the IDENTICAL loader path as driver runs;
  *   - documents are NOT copied verbatim: replica i recombines the first
  *     half of doc d with the second half of doc d+i, so texts are new but
  *     distribution-alike. Verbatim copies would plant 10-clique exact
  *     duplicates and make every near-dup/pair query quadratically heavier
  *     BY CONSTRUCTION, which would drown the real scaling signal the sf1
  *     bench exists to measure;
  *   - embeddings get a small deterministic per-replica perturbation for
  *     the same reason (identical vectors would make ANN self-top-k
  *     degenerate).
  *
  * Usage: runMain graft.GenScale <srcDir> <destDir> <factor> [tables]
  *
  * The optional 4th arg (comma-separated table names) writes only that
  * subset — for decade-probe fixtures where the full set won't fit on
  * disk (sf1000 lineitem alone is ~110 GB). Key bases still come from
  * reading the referenced parents, so FK shifts stay consistent with
  * what a full generation would produce.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val (src, dest, fStr) = (args(0), args(1), args(2))
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val factor = fStr.toInt
    require(factor >= 1)
    val spark = graft.ops.Exprs.sessionDefaults(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dest/$t.parquet")
    def keyBase(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    Seq("region", "nation").foreach(t => if (wanted(t)) write(read(t), t))

    lazy val cust = read("customer")
    lazy val custBase = keyBase(cust, "c_custkey")
    lazy val supp = read("supplier")
    lazy val suppBase = keyBase(supp, "s_suppkey")
    lazy val part = read("part")
    lazy val partBase = keyBase(part, "p_partkey")
    lazy val ord  = read("orders")
    lazy val ordBase  = keyBase(ord, "o_orderkey")
    lazy val li   = read("lineitem")
    lazy val ev = graft.ops.Exprs.normalizeTs(read("events"))
    lazy val evBase = keyBase(ev, "event_id")
    lazy val usrBase = keyBase(ev, "user_id")

    def reps(f: Int => DataFrame): DataFrame =
      (0 until factor).map(f).reduce(_ unionAll _)

    if (wanted("customer"))
      write(reps(i => cust.withColumn("c_custkey",
        col("c_custkey") + lit(i * custBase))), "customer")
    if (wanted("supplier"))
      write(reps(i => supp.withColumn("s_suppkey",
        col("s_suppkey") + lit(i * suppBase))), "supplier")
    if (wanted("part"))
      write(reps(i => part.withColumn("p_partkey",
        col("p_partkey") + lit(i * partBase))), "part")
    if (wanted("orders"))
      write(reps(i => ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * ordBase))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custBase))),
        "orders")
    if (wanted("lineitem"))
      write(reps(i => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * ordBase))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partBase))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppBase))),
        "lineitem")
    if (wanted("events"))
      write(reps(i => ev
        .withColumn("event_id", col("event_id") + lit(i * evBase))
        .withColumn("user_id", col("user_id") + lit(i * usrBase))
        .withColumn("ts",
          timestamp_micros(unix_micros(col("ts")) + lit(i.toLong))
            .cast("timestamp_ntz"))), "events")

    lazy val docs = read("documents")
    lazy val nDocs = docs.count()
    lazy val docBase = keyBase(docs, "doc_id")
    lazy val partner = docs.select(col("doc_id").as("p_id"),
      col("text").as("p_text"))
    def docRep(i: Int): DataFrame =
      if (i == 0) docs
      else docs
        .withColumn("p_id", (col("doc_id") + i) % nDocs)
        .join(partner, "p_id")
        .withColumn("w1", split(col("text"), " "))
        .withColumn("w2", split(col("p_text"), " "))
        .withColumn("text", expr(
          """concat_ws(' ', concat(
            |  slice(w1, 1, greatest(cast(size(w1) / 2 AS INT), 1)),
            |  slice(w2, greatest(cast(size(w2) / 2 AS INT), 1),
            |        size(w2))))""".stripMargin))
        .select((col("doc_id") + lit(i * docBase)).as("doc_id"), col("text"),
          col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
    if (wanted("documents")) write(reps(docRep), "documents")

    lazy val emb = read("embeddings")
    lazy val vecBase = keyBase(emb, "vec_id")
    def embRep(i: Int): DataFrame =
      if (i == 0) emb
      else emb.select((col("vec_id") + lit(i * vecBase)).as("vec_id"),
        expr(s"""transform(embedding, (x, j) ->
          |x + CAST(pmod(vec_id * 31 + j * 7 + $i * 13, 997) AS FLOAT)
          |  * CAST(1e-4 AS FLOAT))""".stripMargin).as("embedding"),
        col("label"))
    if (wanted("embeddings")) write(reps(embRep), "embeddings")

    val counted = if (wanted("lineitem")) "lineitem" else
      only.map(_.head).getOrElse("lineitem")
    val rows = spark.read.parquet(s"$dest/$counted.parquet").count()
    spark.stop()
    println(s"[genscale] wrote $dest factor=$factor ${counted}_rows=$rows")
  }
}
