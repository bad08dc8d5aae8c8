package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Marker-lexicon language-ID argmax as ONE native pass over the token
  * array: score(lang) = count of tokens in that language's marker set
  * (CJK scored as marker-character occurrences in the RAW text, since
  * normalization strips non-latin), result = {s: best score, l: best
  * language}, ties to the lexicographically-LARGEST language label —
  * exactly the semantics of `greatest(struct(score, lang)...)` it
  * replaces (struct comparison: score first, then label), pinned by a
  * spec.
  *
  * The HOF form evaluated one boxed `filter(tokens, isin)` lambda chain
  * PER LANGUAGE per row (5 passes over the token array with per-element
  * boxing) plus a regexp scan; language-ID was the second-heaviest sf10
  * constant in the scaling ladder because of it. Here: one primitive
  * loop over tokens probing small hash sets, one char loop over the raw
  * text, zero allocation beyond the result row.
  */
case class LangBest(left: Expression, right: Expression,
    langs: Seq[String], markerSets: Seq[Seq[String]], cjkLang: String,
    cjkChars: String) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("l", StringType, nullable = false)))
  override def prettyName: String = "lang_best"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_best requires (string, array<string>), got " +
            s"(${l.simpleString(100)}, ${r.simpleString(100)})")
    }

  // sorted language labels; parallel marker sets (null slot = CJK lang,
  // scored on raw chars instead of tokens)
  @transient private lazy val sortedLangs: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    langs.zipWithIndex.map { case (l, i) =>
      if (l == cjkLang) null
      else {
        val s = new java.util.HashSet[UTF8String]()
        markerSets(i).foreach(m => s.add(UTF8String.fromString(m)))
        s
      }
    }.toArray

  override def nullSafeEval(rawAny: Any, toksAny: Any): Any = {
    val raw = rawAny.asInstanceOf[UTF8String]
    val toks = toksAny.asInstanceOf[ArrayData]
    val scores = new Array[Int](sortedLangs.length)
    val nToks = toks.numElements()
    var i = 0
    while (i < nToks) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var l = 0
        while (l < sets.length) {
          if (sets(l) != null && sets(l).contains(t)) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    val rs = raw.toString
    var cjk = 0
    var c = 0
    while (c < rs.length) {
      if (cjkChars.indexOf(rs.charAt(c)) >= 0) cjk += 1
      c += 1
    }
    var bestI = -1
    var bestS = Int.MinValue
    var l = 0
    while (l < sortedLangs.length) {
      val s = if (sets(l) == null) cjk else scores(l)
      // ascending label order + >= update = greatest-struct tie-break
      // (larger label wins equal scores)
      if (s >= bestS) { bestS = s; bestI = l }
      l += 1
    }
    new GenericInternalRow(Array[Any](bestS, sortedLangs(bestI)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (raw, toks) => {
      val setsRef = ctx.addReferenceObj("langSets", sets,
        "java.util.HashSet[]")
      val langsRef = ctx.addReferenceObj("langLabels", sortedLangs,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val cjkRef = ctx.addReferenceObj("cjkChars", cjkChars, "java.lang.String")
      val scores = ctx.freshName("scores")
      val nToks = ctx.freshName("nToks")
      val i = ctx.freshName("i")
      val l = ctx.freshName("l")
      val t = ctx.freshName("t")
      val rs = ctx.freshName("rs")
      val cjk = ctx.freshName("cjk")
      val c = ctx.freshName("c")
      val bestI = ctx.freshName("bestI")
      val bestS = ctx.freshName("bestS")
      val s = ctx.freshName("s")
      s"""
         |int[] $scores = new int[$setsRef.length];
         |int $nToks = $toks.numElements();
         |for (int $i = 0; $i < $nToks; $i++) {
         |  if (!$toks.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $toks.getUTF8String($i);
         |    for (int $l = 0; $l < $setsRef.length; $l++) {
         |      if ($setsRef[$l] != null && $setsRef[$l].contains($t)) $scores[$l]++;
         |    }
         |  }
         |}
         |java.lang.String $rs = $raw.toString();
         |int $cjk = 0;
         |for (int $c = 0; $c < $rs.length(); $c++) {
         |  if ($cjkRef.indexOf($rs.charAt($c)) >= 0) $cjk++;
         |}
         |int $bestI = -1;
         |int $bestS = Integer.MIN_VALUE;
         |for (int $l = 0; $l < $langsRef.length; $l++) {
         |  int $s = ($setsRef[$l] == null) ? $cjk : $scores[$l];
         |  if ($s >= $bestS) { $bestS = $s; $bestI = $l; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Integer.valueOf($bestS), $langsRef[$bestI] });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LangBest =
    copy(left = newLeft, right = newRight)
}

object LangBest {
  /** Column form over graft's marker lexicons: lang_best(raw, tokens).
    * Languages score in sorted-label order; `markers(cjkLang)` must be
    * single-character markers (scored as char occurrences in raw). */
  def apply(raw: Column, toks: Column, markers: Map[String, Seq[String]],
      cjkLang: String): Column = {
    val langs = markers.keys.toSeq.sorted
    require(markers(cjkLang).forall(_.length == 1),
      s"$cjkLang markers must be single characters")
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(LangBest(expression(raw), expression(toks),
      langs, langs.map(markers), cjkLang, markers(cjkLang).mkString))
  }
}
