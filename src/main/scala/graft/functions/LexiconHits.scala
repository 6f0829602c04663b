package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Number of tokens that are members of a fixed lexicon — the scoring
  * primitive behind language-ID and stopword ratios.
  *
  * The declarative form, `size(filter(tokens, t => array_contains(lex, t)))`,
  * is an interpreted higher-order function doing a LINEAR array scan per
  * token per language; five languages × every corpus token was the last
  * interpreted hot path in the cleaning pipeline. Here membership is one
  * hash probe against a set built once per expression instance. Counts are
  * exactly the HOF's (same membership semantics, null tokens don't match),
  * so the language-ID CASE arbitration and its oracle are unaffected.
  */
// lexicon is a Seq (not Array) so case-class equality is structural and
// Catalyst CSE can deduplicate identical scorers across query branches
case class LexiconHits(child: Expression, lexicon: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${dt.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lexicon_hits"

  @transient private lazy val members: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](lexicon.length * 2)
    lexicon.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var hits = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i) && members.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LexiconHits {
  /** Count of token-array elements that appear in `lexicon`. */
  def hits(tokens: Column, lexicon: Seq[String]): Column =
    GraftBridge.column(LexiconHits(GraftBridge.expression(tokens), lexicon))
}
