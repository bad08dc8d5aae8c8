package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lineage.{Lineage, LineageTracker}
import graft.lineage.Lineage._

class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sampleGraph(): Graph = {
    val g = new Graph
    Seq(
      Node("raw", "raw", NodeType.Source),
      Node("clean", "clean", NodeType.Table),
      Node("features", "features", NodeType.Table),
      Node("model", "model", NodeType.Model),
      Node("report", "report", NodeType.Report),
      Node("check1", "check1", NodeType.Validation)
    ).foreach(g.addNode)
    g.addEdge(Edge("raw", "clean", EdgeType.TransformedTo))
    g.addEdge(Edge("clean", "features", EdgeType.TransformedTo))
    g.addEdge(Edge("features", "model", EdgeType.UsedBy))
    g.addEdge(Edge("model", "report", EdgeType.DerivedFrom))
    g.addEdge(Edge("clean", "check1", EdgeType.ValidatedBy))
    g
  }

  test("graph traversal: upstream/downstream/roots/leaves/toposort") {
    val g = sampleGraph()
    assert(g.downstream("raw").map(_._1.id).toSet ==
      Set("clean", "features", "model", "report", "check1"))
    assert(g.downstream("raw", depth = 1).map(_._1.id) == Seq("clean"))
    assert(g.upstream("model").map(_._1.id).toSet ==
      Set("features", "clean", "raw"))
    assert(g.roots.map(_.id) == Seq("raw"))
    assert(g.leaves.map(_.id).toSet == Set("report", "check1"))
    val topo = g.topologicalSort.map(_.id)
    assert(topo.indexOf("raw") < topo.indexOf("clean"))
    assert(topo.indexOf("features") < topo.indexOf("model"))
    assert(topo.size == 6)
    assert(g.path("raw", "report").contains(
      Seq("raw", "clean", "features", "model", "report")))
    assert(g.path("report", "raw").isEmpty)
  }

  test("cycle rejection") {
    val g = sampleGraph()
    intercept[CyclicDependencyError] {
      g.addEdge(Edge("report", "raw", EdgeType.DependsOn))
    }
    intercept[CyclicDependencyError] {
      g.addEdge(Edge("clean", "clean", EdgeType.DependsOn))
    }
  }

  test("impact analysis: levels by type, decay with distance") {
    val g = sampleGraph()
    val ia = new ImpactAnalyzer(g)
    val r = ia.analyzeImpact("raw")
    assert(r.totalAffected == 5 && r.maxDepth == 4)
    val byId = r.affected.map(a => a.node.id -> a).toMap
    assert(byId("clean").impactLevel == "high")       // table, d=1
    assert(byId("check1").impactLevel == "low")       // validation, d=2
    assert(byId("model").impactLevel == "critical")   // model, d=3
    assert(byId("report").impactLevel == "low")       // report, d=4 → -1
    assert(r.criticalNodes.map(_.node.id) == Seq("model"))
    // skip validations
    assert(ia.analyzeImpact("raw", includeValidations = false)
      .affected.forall(_.node.nodeType != NodeType.Validation))
    // what-if-delete
    val del = ia.whatIfDelete("features")
    assert(del("directConsumers") == Seq("model"))
    assert(del("safe") == false)
    assert(ia.whatIfDelete("report")("safe") == true)
    // dependency chain nearest-first
    assert(ia.dependencyChain("model").map(_.id) ==
      Seq("features", "clean", "raw"))
  }

  test("tracker records source->transformation->validation->output") {
    val t = new LineageTracker
    t.trackSource("s3://bucket/raw", "raw")
    t.trackTransformation(Seq("s3://bucket/raw"), "clean", "cleanse",
      "filter")
    t.trackValidation("clean", "run-42", passed = true)
    t.trackOutput("clean", "report.html", "report")
    assert(t.graph.nodes.size == 5) // src, xform, clean, validation, report
    assert(t.graph.downstream("s3://bucket/raw").map(_._1.id).toSet ==
      Set("xform:clean", "clean", "validation:run-42", "report.html"))
    val json = t.graph.toJson
    assert(json.contains("\"xform:clean\"") && json.contains("derived_from"))
  }

  test("planSources derives file nodes from a real DataFrame plan") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderstatus").count()
    val srcs = Lineage.planSources(joined)
    assert(srcs.map(_.name).toSet == Set("lineitem", "orders"))
    assert(srcs.forall(_.nodeType == NodeType.File))

    val t = new LineageTracker
    t.trackFromPlan(joined, "order_status_counts")
    assert(t.graph.hasNode("order_status_counts"))
    val up = t.graph.upstream("order_status_counts").map(_._1.name)
    assert(up.contains("lineitem") && up.contains("orders"))
  }
}
