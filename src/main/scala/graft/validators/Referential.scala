package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-table validators (reference: truthound `validators/referential/`
  * 17 classes + `validators/cross_table/` 4 classes). These take more than
  * one table, so they sit outside the single-table fused pass and run as
  * join jobs through [[CrossSuiteRunner]].
  *
  * Scale notes: orphan detection is a `left_anti` join on the key — Spark
  * broadcasts the parent side automatically when it's under the broadcast
  * threshold (typical dimension tables); set `broadcastParent` to force the
  * hint for parents known small. Anti-join output is counted, never
  * collected. */
trait CrossTableValidator {
  def name: String
  def category: String
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue]
  protected def issue(column: String, issueType: String, count: Long,
      total: Long, severity: Severity = Severity.High,
      expected: String = "", actual: String = ""): ValidationIssue =
    ValidationIssue(name, column, issueType, count, total, severity.label,
      expected, actual)
}

/** Suite runner for cross-table checks; single-table fused validation stays
  * in [[SuiteRunner]]. */
object CrossSuiteRunner {
  def run(tables: Map[String, DataFrame],
          validators: Seq[CrossTableValidator],
          datasetName: String = "multi"): ValidationRunResult = {
    val checks = validators.map { v =>
      val t0 = System.nanoTime()
      val issues =
        try v.run(tables)
        catch {
          case e: Exception =>
            Seq(ValidationIssue(v.name, "*", "execution_error", 0, 0,
              Severity.Critical.label, "", e.getMessage))
        }
      CheckResult(v.name, v.category, issues.isEmpty, issues,
        (System.nanoTime() - t0) / 1000000)
    }
    ValidationRunResult(datasetName, -1, checks, "cross-table", checks.size)
  }
}

/** ForeignKeyValidator / CompositeForeignKeyValidator / OrphanRecordValidator:
  * child keys must exist in the parent (anti-join orphan count). */
final case class ForeignKeyCheck(
    childTable: String, childKeys: Seq[String],
    parentTable: String, parentKeys: Seq[String],
    broadcastParent: Boolean = false,
    allowNullKeys: Boolean = true) extends CrossTableValidator {
  require(childKeys.size == parentKeys.size)
  val name = s"fk[$childTable(${childKeys.mkString(",")})->$parentTable]"
  val category = "referential"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val child = tables(childTable)
    val parent0 = tables(parentTable).select(parentKeys.map(col): _*).distinct()
    val parent = if (broadcastParent) broadcast(parent0) else parent0
    val joinCond = childKeys.zip(parentKeys)
      .map { case (c, p) => child(c) === parent(p) }.reduce(_ && _)
    val candidates =
      if (allowNullKeys) child.filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
      else child
    val orphans = candidates.join(parent, joinCond, "left_anti").count()
    val total = child.count()
    if (orphans > 0)
      Seq(issue(childKeys.mkString(","), "orphan_records", orphans, total,
        Severity.Critical,
        expected = s"all keys present in $parentTable(${parentKeys.mkString(",")})"))
    else Nil
  }
}

/** SelfReferentialFKValidator: e.g. manager_id -> id in the same table. */
final case class SelfReferentialFKCheck(tableName: String, childKey: String,
    parentKey: String) extends CrossTableValidator {
  val name = s"self_fk[$tableName.$childKey->$parentKey]"
  val category = "referential"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val df = tables(tableName)
    val parents = df.select(col(parentKey).as("__pk")).distinct()
    val orphans = df.filter(col(childKey).isNotNull)
      .join(parents, col(childKey) === col("__pk"), "left_anti").count()
    if (orphans > 0)
      Seq(issue(childKey, "dangling_self_reference", orphans, df.count(),
        Severity.High))
    else Nil
  }
}

/** CircularReferenceValidator / HierarchyDepthValidator: bounded-depth BFS
  * over a (node -> parent) edge relation via iterative self-joins. Depth is
  * capped (the reference caps too) so each iteration is one join. */
final case class HierarchyCheck(tableName: String, idCol: String,
    parentCol: String, maxDepth: Int = 10) extends CrossTableValidator {
  val name = s"hierarchy[$tableName.$idCol<-$parentCol]"
  val category = "referential"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val edges = tables(tableName)
      .select(col(idCol).as("id"), col(parentCol).as("parent"))
      .filter(col("parent").isNotNull && col("parent") =!= col("id"))
    // frontier: nodes reachable from themselves in k steps => cycle.
    // Opaque checkpoint per level (see Hierarchy.depths): an un-cut
    // frontier re-optimizes the whole join chain each level AND
    // constraint inference composes computed parent expressions through
    // the join equality — exponential plan growth on expression-valued
    // parent columns.
    var frontier = org.apache.spark.sql.graft.PlanBridge.opaqueCheckpoint(edges)
    var cycles = 0L
    var depth = 1
    var exceeded = 0L
    while (depth < maxDepth && cycles == 0 && !frontier.isEmpty) {
      val stepped = org.apache.spark.sql.graft.PlanBridge.opaqueCheckpoint(
        frontier.as("f")
          .join(edges.as("e").hint("shuffle_hash"),
            col("f.parent") === col("e.id"))
          .select(col("f.id").as("id"), col("e.parent").as("parent")))
      cycles = stepped.filter(col("id") === col("parent")).count()
      frontier = stepped
      depth += 1
      if (depth == maxDepth) exceeded = frontier.count()
    }
    val total = tables(tableName).count()
    (if (cycles > 0)
      Seq(issue(idCol, "circular_reference", cycles, total, Severity.Critical))
    else Nil) ++
    (if (exceeded > 0)
      Seq(issue(idCol, "hierarchy_depth_exceeded", exceeded, total,
        Severity.Medium, expected = s"depth<$maxDepth"))
    else Nil)
  }
}

/** CrossTableRowCountValidator / FactorValidator: |A| vs |B| (equality or
  * ratio-bounded). */
final case class RowCountCompareCheck(tableA: String, tableB: String,
    minRatio: Double, maxRatio: Double) extends CrossTableValidator {
  val name = s"rowcount_compare[$tableA/$tableB]"
  val category = "cross_table"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val a = tables(tableA).count()
    val b = tables(tableB).count()
    val ratio = if (b == 0) Double.PositiveInfinity else a.toDouble / b
    if (ratio < minRatio || ratio > maxRatio)
      Seq(issue("*", "row_count_ratio_out_of_bounds", a, b, Severity.High,
        expected = s"[$minRatio,$maxRatio]", actual = f"$ratio%.4f"))
    else Nil
  }
}

/** CrossTableAggregateValidator: agg(A.col) vs agg(B.col) within relative
  * tolerance. */
final case class AggregateCompareCheck(tableA: String, colA: String,
    tableB: String, colB: String, agg: String = "sum",
    relTolerance: Double = 0.0) extends CrossTableValidator {
  val name = s"agg_compare[$agg($tableA.$colA) vs $agg($tableB.$colB)]"
  val category = "cross_table"
  private def aggCol(c: String): Column = agg match {
    case "sum" => sum(col(c)).cast("double")
    case "avg" => avg(col(c))
    case "count" => count(col(c)).cast("double")
    case "count_distinct" => count_distinct(col(c)).cast("double")
    case "min" => min(col(c)).cast("double")
    case "max" => max(col(c)).cast("double")
  }
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val a = tables(tableA).agg(aggCol(colA)).head().getDouble(0)
    val b = tables(tableB).agg(aggCol(colB)).head().getDouble(0)
    val rel = if (b == 0) (if (a == 0) 0.0 else Double.PositiveInfinity)
              else math.abs(a - b) / math.abs(b)
    if (rel > relTolerance)
      Seq(issue(s"$colA/$colB", "aggregate_mismatch", 1, 0, Severity.High,
        expected = f"$agg($tableB.$colB)=$b%.4f ±${relTolerance * 100}%%",
        actual = f"$a%.4f"))
    else Nil
  }
}

/** OptimizedCrossTableAggregateValidator semantics (reference
  * `cross_table/aggregate.py:171-277`): per-group aggregate comparison via
  * full-outer join; counts groups whose aggregates disagree. */
final case class GroupedAggregateCompareCheck(tableA: String, tableB: String,
    keyA: String, keyB: String, colA: String, colB: String,
    agg: String = "count", eps: Double = 1e-9) extends CrossTableValidator {
  val name = s"grouped_agg_compare[$tableA.$keyA vs $tableB.$keyB]"
  val category = "cross_table"
  private def aggOf(c: String): Column = agg match {
    case "count" => count(col(c)).cast("double")
    case "sum"   => sum(col(c)).cast("double")
    case "avg"   => avg(col(c))
  }
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val a = tables(tableA).groupBy(col(keyA).as("__k"))
      .agg(aggOf(colA).as("__a"))
    val b = tables(tableB).groupBy(col(keyB).as("__k"))
      .agg(aggOf(colB).as("__b"))
    val joined = a.join(b, Seq("__k"), "full_outer")
    // One job: counting matches and total in a single aggregate avoids
    // executing the full-outer join (both groupBys + shuffle) twice.
    val row = joined.agg(
      count(lit(1)).as("total"),
      count(when(col("__a").isNull || col("__b").isNull ||
        abs(col("__a") - col("__b")) > eps, 1)).as("mismatch")).head()
    val totalGroups = row.getLong(0)
    val mismatches = row.getLong(1)
    if (mismatches > 0)
      Seq(issue(s"$keyA/$keyB", "group_aggregate_mismatch", mismatches,
        totalGroups, Severity.High))
    else Nil
  }
}

/** Hierarchy traversal ops shared by validators and query surfaces
  * (reference: truthound `validators/referential/hierarchy.py` — depth +
  * cycle analysis over (id, parent) edges).
  *
  * Scale design: iterative frontier joins (one equi-join per level, depth
  * is bounded), never a driver-side graph build. Nodes NOT reached from a
  * root within `maxDepth` levels are either on/under a cycle or deeper
  * than the cap — both validation failures, reported as unreached. */
object Hierarchy {

  /** Pointer-doubling state: (id, anc, dist) per node, where `anc` is the
    * node's 2^k-step ancestor (NULL once a root is reached) and `dist` the
    * number of edges accumulated to reach `anc` (= to the root when anc is
    * NULL). After k rounds every node within 2^k edges of a root has
    * terminated — ceil(log2(maxDepth)) self-joins replace maxDepth
    * frontier joins, and each round shuffles the node set ONCE instead of
    * re-shuffling the full edge set per level (the 100 TB win: depth-40
    * hierarchies cost 6 shuffles, not 40). Nodes whose chain dangles (a
    * parent id that does not exist) or sits on/under a cycle never
    * terminate and fall out as unreached. */
  private def doubledState(df: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int): DataFrame = {
    var state = org.apache.spark.sql.graft.PlanBridge.opaqueCheckpoint(
      df.select(col(idCol).as("id"), col(parentCol).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("dist")))
    val rounds = math.ceil(math.log(math.max(2, maxDepth).toDouble) /
      math.log(2.0)).toInt
    var k = 0
    while (k < rounds) {
      val t = state.select(col("id").as("t_id"), col("anc").as("t_anc"),
        col("dist").as("t_dist"), lit(true).as("t_hit"))
      // shuffle_hash, not broadcast: broadcasting a checkpointed side
      // re-serializes it through the driver every round (and tripped
      // broadcast-build OOMs in long sessions); the opaque checkpoint per
      // round cuts lineage AND the LogicalRDD constraint blow-up
      state = org.apache.spark.sql.graft.PlanBridge.opaqueCheckpoint(
        state.join(t.hint("shuffle_hash"), col("anc") === col("t_id"), "left")
          .select(col("id"),
            when(col("anc").isNull || col("t_hit").isNull, col("anc"))
              .otherwise(col("t_anc")).as("anc"),
            when(col("anc").isNull || col("t_hit").isNull, col("dist"))
              .otherwise(col("dist") + col("t_dist")).as("dist")))
      k += 1
    }
    state
  }

  /** (id, depth) for every node reachable from a root (parent IS NULL =
    * depth 1) in <= maxDepth levels. */
  def depths(df: DataFrame, idCol: String, parentCol: String,
             maxDepth: Int): DataFrame =
    doubledState(df, idCol, parentCol, maxDepth)
      .filter(col("anc").isNull && col("dist") + 1 <= maxDepth)
      .select(col("id"), (col("dist") + 1).cast("int").as("depth"))

  /** (depth, cnt) histogram of reachable nodes plus a depth = -1 row for
    * unreached nodes (cycle members/descendants, dangling chains, or
    * depth > maxDepth). One aggregate over the pointer-doubled state —
    * no per-level count jobs. */
  def depthHistogram(df: DataFrame, idCol: String, parentCol: String,
                     maxDepth: Int): DataFrame =
    doubledState(df, idCol, parentCol, maxDepth)
      .select(when(col("anc").isNull && col("dist") + 1 <= maxDepth,
        col("dist") + 1).otherwise(-1).cast("int").as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("cnt"))
}

/** Cascade integrity (reference `referential/cascade.py`).
  *
  * The reference walks python sets on the driver; here RESTRICT is a
  * distributed anti-join orphan count and SET_NULL a null-FK count —
  * the same verdicts at any scale. */
final case class CascadeRule(childTable: String, childKeys: Seq[String],
    parentTable: String, parentKeys: Seq[String],
    onDelete: String = "RESTRICT")

final case class CascadeIntegrityCheck(rules: Seq[CascadeRule])
    extends CrossTableValidator {
  val name = "cascade_integrity"
  val category = "referential"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    // rules are independent count jobs — submit concurrently (Par), then
    // pay one count job per FAILING child table for the denominators
    val ruleCounts: Seq[(CascadeRule, Long)] =
      graft.core.Par.map(rules) { r =>
        val child = tables(r.childTable)
        val n = r.onDelete match {
          case "RESTRICT" | "NO_ACTION" =>
            val parent = tables(r.parentTable)
              .select(r.parentKeys.map(col): _*).distinct()
            val cond = r.childKeys.zip(r.parentKeys)
              .map { case (c, p) => child(c) === parent(p) }.reduce(_ && _)
            child.filter(r.childKeys.map(col(_).isNotNull).reduce(_ && _))
              .join(parent, cond, "left_anti").count()
          case "SET_NULL" =>
            child.filter(r.childKeys.map(col(_).isNull).reduce(_ || _)).count()
          case _ => 0L
        }
        r -> n
      }
    val totals: Map[String, Long] = graft.core.Par.map(
      ruleCounts.collect { case (r, n) if n > 0 => r.childTable }.distinct) {
      t => t -> tables(t).count()
    }.toMap
    val perRule = ruleCounts.flatMap { case (r, n) =>
      r.onDelete match {
        case "RESTRICT" | "NO_ACTION" if n > 0 =>
          Seq(issue(r.childKeys.mkString(","),
            "cascade_restrict_violation", n, totals(r.childTable),
            Severity.Critical,
            expected = s"no orphans in ${r.childTable} (RESTRICT)"))
        case "SET_NULL" if n > 0 =>
          Seq(issue(r.childKeys.mkString(","),
            "cascade_set_null_detected", n, totals(r.childTable),
            Severity.Low,
            expected = "NULL FKs indicate deleted parents"))
        case _ => Nil
      }
    }
    // chain conflicts: one child table under rules with differing onDelete
    val conflicts = rules.groupBy(_.childTable).collect {
      case (t, rs) if rs.map(_.onDelete).distinct.size > 1 =>
        issue(t, "cascade_chain_conflict",
          rs.map(_.onDelete).distinct.size.toLong, 0, Severity.Medium)
    }
    perRule ++ conflicts
  }
}

/** CascadeDepthValidator: metadata-only DFS over declared child->parent
  * relations; depth measured from root tables (tables referencing nothing),
  * cycles count as depth 0 (reference `cascade.py:297-359`). */
final case class CascadeDepthCheck(relations: Seq[(String, String)],
    maxDepth: Int = 5) extends CrossTableValidator {
  val name = "cascade_depth"
  val category = "referential"
  def depthOf(root: String): Int = {
    val childrenOf = relations.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def go(t: String, seen: Set[String]): Int =
      if (seen.contains(t)) 0
      else 1 + childrenOf.getOrElse(t, Nil)
        .map(c => go(c, seen + t)).foldLeft(0)(math.max)
    go(root, Set.empty)
  }
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val parents = relations.map(_._2).toSet
    val children = relations.map(_._1).toSet
    val roots = parents -- children
    roots.toSeq.sorted.flatMap { r =>
      val d = depthOf(r)
      if (d > maxDepth)
        Seq(issue(r, "cascade_depth_exceeded", d.toLong, 0,
          if (d > maxDepth * 2) Severity.High else Severity.Medium,
          expected = s"depth<=$maxDepth")) else Nil
    }
  }
}
