package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonicalization pass a multilingual
  * corpus needs BEFORE any dedup/fingerprint/quality step: visually
  * identical strings ("café" precomposed vs "cafe" + U+0301) hash apart
  * and silently defeat exact dedup unless every document goes through NFC
  * first; accent stripping then folds diacritic variants for matching and
  * language-robust fingerprints. Spark ships neither (no `normalize` SQL
  * function); both are pure per-row scalars — scan-side, zero shuffle.
  *
  * Semantics are pinned to the Unicode standard algorithms (JDK
  * `java.text.Normalizer`), which DuckDB's utf8proc implements
  * identically for canonical forms — the gate proves the cross-engine
  * agreement on constructed precomposed/combining/undecomposable inputs.
  * Accent stripping = NFD, drop combining marks (category Mn), NFC
  * recompose; letters WITHOUT canonical decompositions (ø, ß, æ) are kept,
  * matching `strip_accents`.
  */
object UnicodeNorm {
  def nfc(c: Column): Column = GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
  def stripAccents(c: Column): Column = GraftBridge.column(StripAccents(GraftBridge.expression(c)))

  private[functions] def nfcJvm(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  private[functions] def stripJvm(s: String): String = {
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }
}

/** NFC canonical normalization of a string column. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNorm.nfcJvm(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping: NFD → drop Mn combining marks → NFC. */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNorm.stripJvm(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
