package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC / NFD / NFKC / NFKD) — the
  * missing first step of multilingual text canonicalization. Every
  * hash-keyed operator in this engine (exact dedup, shingles, MinHash,
  * fingerprints, the CMS row hashes) compares BYTES, and Unicode lets
  * the same text arrive as different bytes: composed é (U+00E9) vs
  * decomposed e+◌́ (U+0065 U+0301) are distinct md5 inputs, so a
  * multilingual corpus silently under-dedups unless normalization runs
  * first. NFKC additionally folds compatibility forms (ﬁ → fi,
  * full-width Ａ → A, ① → 1) — the usual choice before training-data
  * hashing. Spark has no built-in for this; a Scala UDF would break
  * whole-stage codegen around the very scans this must run inside.
  *
  * The JVM's `java.text.Normalizer` (ICU-derived, Unicode-standard
  * NFC/NFKC) does the real work; this expression's job is staying
  * inside the codegen span and not paying for it when it isn't needed:
  * the generated code calls one static helper whose ASCII fast path
  * scans bytes and returns the INPUT UTF8String untouched (no decode,
  * no allocation) — on mostly-ASCII corpora the cost is one vectorized
  * byte scan per row, and only genuinely non-ASCII rows decode,
  * normalize, and re-encode.
  *
  * Determinism: normalization output for a fixed form is defined by
  * the Unicode standard and stable for a fixed JVM; results carry no
  * partition- or order-dependence. (Cross-ENGINE replay is the one
  * thing not promised here — DuckDB exposes only NFC and its utf8proc
  * tables can trail the JVM's Unicode version on recent codepoints —
  * so the operator is spec-gated on golden codepoints rather than
  * driver-gated; the test data's ASCII text would make an oracle row
  * vacuous anyway.)
  *
  * Registered as SQL function `graft_normalize(str, 'NFKC')` by
  * [[graft.GraftExtensions]].
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string argument, got " +
          child.dataType.simpleString)
    else if (!UnicodeNormalize.Forms.contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of " +
          s"${UnicodeNormalize.Forms.keys.mkString("/")}, got '$formName'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalize(s.asInstanceOf[UTF8String], formName)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$")
    val form = ctx.addReferenceObj("formName", formName, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"$cls.normalize($c, $form)")
  }
}

object UnicodeNormalize {
  val Forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  /** Static entry shared by eval and generated code. ASCII fast path:
    * every form is the identity on pure-ASCII text, and UTF-8 marks
    * non-ASCII with the high bit — one byte scan decides, the common
    * row never decodes. */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, Forms(formName)))
  }
}
