package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 made Column construction private[sql]
  * (Column wraps a ColumnNode, not an Expression), so extension libraries
  * need a shim inside the org.apache.spark.sql namespace — the same
  * technique connector libraries use. No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether the column tree contains a DISTINCT aggregate (Spark 4 keeps
    * unanalyzed Columns as ColumnNode trees, so catalyst-side checks see
    * only an opaque wrapper; walk the node tree instead). */
  def hasDistinctAgg(c: Column): Boolean = {
    import org.apache.spark.sql.internal._
    def walk(n: ColumnNodeLike): Boolean = n match {
      case f: UnresolvedFunction => f.isDistinct || f.arguments.exists(walk)
      case a: Alias              => walk(a.child)
      case w: Cast               => walk(w.child)
      case _                     => false
    }
    walk(c.node)
  }
}

/** Plan-level bridge utilities. */
object PlanBridge {
  /** A materialized copy of `df` with NO optimizer-visible lineage: runs
    * localCheckpoint (eager) and re-wraps the checkpointed rows in a fresh
    * LogicalRDD WITHOUT origin stats/constraints.
    *
    * Why: LogicalRDD from plain `localCheckpoint` carries the source
    * plan's constraints (`originConstraints`) so downstream joins keep
    * optimizing — but in ITERATIVE self-join loops (hierarchy BFS) those
    * constraints re-compose the parent-derivation expression through the
    * join equality each level, growing the plan ~5x per iteration
    * (measured: 2.6 KB -> 21 MB in 7 levels) until janino chokes. A bare
    * LogicalRDD resets the constraint set each level; zero extra compute
    * (the checkpointed InternalRow RDD is reused as-is). */
  def opaqueCheckpoint(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cp = df.localCheckpoint(true)
    val classicSpark = cp.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      cp.queryExecution.toRdd, cp.schema, isStreaming = false)
  }
}

/** Runtime function registration for ALREADY-RUNNING sessions (the
  * config path `spark.sql.extensions=graft.functions.GraftExtensions`
  * covers new sessions; this covers notebooks/REPLs attaching later). */
object FunctionBridge {
  /** Register every graft SQL function (the GraftExtensions set) on an
    * already-running session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftExtensions.all.foreach(e => register(spark, e))

  /** Register exactly the function asked for — a caller wanting only
    * simhash64 must not have its other temp functions silently replaced. */
  def registerSimhash(spark: org.apache.spark.sql.SparkSession): Unit =
    register(spark,
      graft.functions.GraftExtensions.all.find(_._1 == "simhash64").get)

  private def register(spark: org.apache.spark.sql.SparkSession,
      entry: (String, String, Int, Seq[Expression] => Expression)): Unit = {
    val (name, _, arity, builder) = entry
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (exprs: Seq[Expression]) => {
        require(exprs.size == arity, s"$name takes exactly $arity argument(s)")
        builder(exprs)
      },
      "built-in")
  }
}
