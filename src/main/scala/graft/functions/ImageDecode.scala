package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real image decode for multimodal pipelines, JDK-only: PNG/JPEG/GIF/BMP
  * through `javax.imageio` (ships with the JDK — no external codecs
  * needed), producing `{width, height, channels, mean_luma}` per payload;
  * undecodable or truncated bytes yield NULL rather than failing the
  * task, so one corrupt blob can't kill a 100 TB scan.
  *
  * mean_luma is the Rec.601 luma (0.299 R + 0.587 G + 0.114 B, the
  * JPEG/ITU convention) averaged over all pixels, read through
  * `BufferedImage.getRGB` so the result is independent of the decoder's
  * internal raster layout (BGR vs RGB vs palette).
  *
  * The decode itself is JDK library code, so `doGenCode` emits a static
  * call — the surrounding projection stays inside whole-stage codegen
  * and the bytes never leave the scan stage. Formats the JDK cannot
  * decode (audio/video feature extraction, learned embeddings) remain
  * behind the loudly-marked stub in `pipeline.Multimodal`.
  */
case class ImageDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageDecode.schema
  override def prettyName: String = "image_decode"
  // decode failure => null even for non-null input
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_decode requires binary, got ${other.simpleString(100)}")
    }

  override def nullSafeEval(input: Any): Any =
    ImageDecode.decodeToRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ImageDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, bytes => {
      val row = ctx.freshName("row")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = $helper.decodeToRow($bytes);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDecode =
    copy(child = newChild)
}

object ImageDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Static decode kernel shared by eval and generated code. Returns
    * null for anything ImageIO cannot parse. */
  def decodeToRow(bytes: Array[Byte]): InternalRow =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) null
        else {
          val channels = img.getRaster.getNumBands
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += 0.299 * r + 0.587 * g + 0.114 * b
              x += 1
            }
            y += 1
          }
          new GenericInternalRow(Array[Any](
            w, h, channels, sum / (w.toLong * h)))
        }
      }
    } catch { case _: Exception => null }

  /** Column form: image_decode(binaryCol). */
  def apply(content: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ImageDecode(org.apache.spark.sql.graft.ColumnBridge.expression(content)))
}
