package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Every custom Catalyst expression must survive
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY`: in that mode an
  * expression whose `doGenCode` emits uncompilable Java THROWS instead
  * of silently falling back to the interpreted path. Normal runs
  * exercise doGenCode through whole-stage codegen, but projections
  * outside a whole-stage region (wide schemas, fallback contexts) use
  * the expression-level factory — a silent fallback there would erase
  * exactly the 100 TB win the native kernels exist for. */
class CodegenOnlySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("all native expressions execute under CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = Seq(
        (1L, "The Quick  brown FOX!! 42", Seq("the", "quick", "brown")),
        (2L, "的是了 mixed ünïcödé", Seq("el", "la", "de")),
        (3L, "", Seq.empty[String]))
        .toDF("id", "text", "toks")
      val textRows = docs.select(
        graft.pipeline.Text.normalize($"text").as("n"),
        graft.functions.SimHash64($"toks").as("sh"),
        graft.functions.ShingleHashes64($"toks", 2).as("sg"),
        graft.pipeline.Text.langBest($"text", $"toks").as("lb"))
        .collect()
      assert(textRows.length == 3)
      assert(textRows(0).getString(0) == "the quick brown fox 42")

      val vecs = Seq((1L, Array(1.0f, 0.0f, 0.5f)),
        (2L, Array(-1.0f, 2.0f, 0.0f))).toDF("id", "v")
      val buckets = vecs.select(
        graft.functions.HyperplaneBucket($"v", planes = 8, dim = 3))
        .collect()
      assert(buckets.length == 2)

      val png = {
        val img = new java.awt.image.BufferedImage(2, 2,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val imgs = Seq((1L, png), (2L, Array[Byte](9, 9)))
        .toDF("id", "content")
        .select(graft.functions.ImageDecode($"content").as("d")).collect()
      assert(imgs(0).getStruct(0).getInt(0) == 2 && imgs(1).isNullAt(0))
    }
  }
}
