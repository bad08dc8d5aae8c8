package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A =
    Bucketing.withoutBroadcast(spark)(f)

  test("co-bucketed join plans with zero exchange; non-bucketed does not") {
    val fact = spark.range(10000)
      .select((col("id") % 500).as("k"), col("id").as("v"))
    val dim = spark.range(400).select(col("id").as("k"))
    Bucketing.writeBucketed(fact, "bs_fact", Seq("k"), 4, Seq("k"))
    Bucketing.writeBucketed(dim, "bs_dim", Seq("k"), 4, Seq("k"))
    val bf = spark.table("bs_fact"); val bd = spark.table("bs_dim")
    withNoBroadcast {
      val colocated = bf.join(bd, Seq("k"))
      assert(Bucketing.exchangeFree(colocated),
        colocated.queryExecution.executedPlan.toString)
      // values survive the layout: same join result as the plain frames
      assert(colocated.count() == fact.join(dim, Seq("k")).count())
      // negative control — the un-bucketed frames must shuffle
      assert(!Bucketing.exchangeFree(fact.join(dim, Seq("k"))))
      // anti-join (the FK orphan shape) is exchange-free too
      val anti = bf.join(bd, bf("k") === bd("k"), "left_anti")
      assert(Bucketing.exchangeFree(anti))
      assert(anti.count() == 10000L / 500 * 100) // keys 400..499
      // typed node walk, not a string scan: a plan whose filter
      // LITERAL says "Exchange" must not flip the verdict
      assert(Bucketing.exchangeFree(
        bf.filter(concat(col("k"), lit("x")) === "Exchange")))
    }
  }

  test("FK orphan check over bucketed tables matches the plain-frame run") {
    val fact = spark.range(5000).select((col("id") % 300).as("fk"))
    val dim = spark.range(250).select(col("id").as("pk"))
    Bucketing.writeBucketed(fact, "bs_fk_fact", Seq("fk"), 4)
    Bucketing.writeBucketed(dim, "bs_fk_dim", Seq("pk"), 4)
    val check = graft.validators.ForeignKeyCheck(
      "fact", Seq("fk"), "dim", Seq("pk"))
    val bucketed = withNoBroadcast {
      check.run(Map("fact" -> spark.table("bs_fk_fact"),
        "dim" -> spark.table("bs_fk_dim")))
    }
    val plain = check.run(Map("fact" -> fact, "dim" -> dim))
    assert(bucketed.map(i => (i.issueType, i.count))
      == plain.map(i => (i.issueType, i.count)))
    assert(bucketed.head.count > 0) // keys 250..299 are orphaned
  }

  test("writeBucketed validates its arguments") {
    val df = spark.range(3).toDF("k")
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "bs_bad", Nil, 4)
    }
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "bs_bad", Seq("k"), 0)
    }
  }
}
