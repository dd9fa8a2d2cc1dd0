package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — the first cleaning pass of
  * any multilingual corpus: the same visible text arrives precomposed,
  * decomposed, with compatibility ligatures/fullwidth forms, and in
  * arbitrary combining-mark order, and every downstream hash (exact
  * dedup, MinHash shingles, split assignment) treats those byte-variants
  * as distinct documents unless they are normalized first.
  *
  * An Expression rather than a UDF: stays inside whole-stage codegen,
  * and the already-normalized fast path (the overwhelming majority of
  * real text) returns the INPUT UTF8String without any allocation —
  * `Normalizer.isNormalized` is a quick-check scan.
  *
  * Unicode's normalization stability policy freezes the normalization of
  * assigned codepoints, so the JDK (ICU-derived) and utf8proc (DuckDB)
  * agree — NFC output is oracle-checkable against `nfc_normalize`.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be NFC/NFD/NFKC/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_norm"

  @transient private lazy val formEnum = Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], formEnum)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.normalize($c, " +
        s"java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  /** Normalize, returning the input object untouched when already in
    * normal form (no re-encode, no allocation).
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
