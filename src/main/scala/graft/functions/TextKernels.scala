package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scan replacements for the two Java-regex hot spots of the text
  * pipeline. `java.util.regex` backtracks and allocates per match; on a
  * corpus scan the `\s+` split and the whitespace-collapse dominate several
  * gates (corpus_report measured 2.1 s at sf0.1, ~17× the DuckDB RE2 cost
  * for the same SQL). Whitespace under Java `\s` is pure ASCII
  * (`[ \t\n\x0B\f\r]`), and ASCII bytes never appear inside a UTF-8
  * multibyte sequence, so both kernels scan raw UTF-8 bytes — no decode, no
  * regex machinery, no per-token garbage beyond the output itself.
  *
  * Parity contract (property-tested against the regex forms in
  * TextKernelsSpec): byte-identical output INCLUDING the edge shapes —
  * empty/all-space input splits to `[""]`, a leading/trailing non-space
  * whitespace run yields a leading/trailing empty token (Java
  * `Pattern.split(…, -1)` keeps both), and collapse rewrites every maximal
  * run anywhere in the string to one 0x20.
  */
private object WsBytes {
  /** Java regex `\s` class: space, tab, LF, VT, FF, CR — all ASCII. */
  @inline def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
}

/** `split(trim(text), "\s+")` as one byte scan. SQL `trim` strips 0x20
  * only; the split then treats the full `\s` class as separators, keeping
  * leading/trailing empty tokens exactly like `Pattern.split(s, -1)`.
  */
case class FastTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "fast_tokens"

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(FastTokens.tokenize(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FastTokens {
  /** Tokens of `trim(s)` split on `\s+` runs, Pattern.split(-1) semantics. */
  def tokenize(u: UTF8String): Array[UTF8String] = {
    val b = u.getBytes
    var start = 0
    var end = b.length
    while (start < end && b(start) == 0x20) start += 1 // SQL trim: 0x20 only
    while (end > start && b(end - 1) == 0x20) end -= 1
    if (start >= end) return Array(UTF8String.EMPTY_UTF8)
    val out = new java.util.ArrayList[UTF8String](16)
    var segStart = start
    var i = start
    while (i < end) {
      if (WsBytes.isWs(b(i))) {
        out.add(UTF8String.fromBytes(b, segStart, i - segStart))
        i += 1
        while (i < end && WsBytes.isWs(b(i))) i += 1
        segStart = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(b, segStart, end - segStart))
    out.toArray(new Array[UTF8String](out.size))
  }

  /** `s.trim.split("\s+")` for String callers (ShingleHashes): identical
    * tokens to the regex form — `String.trim` strips every char ≤ 0x20,
    * then `\s+` runs separate tokens, Pattern.split default limit (0)
    * semantics: a leading run yields a leading "", trailing empties are
    * DROPPED (the String path never used limit -1).
    */
  def splitJava(s0: String): Array[String] = {
    val s = s0.trim
    val n = s.length
    if (n == 0) return Array("")
    @inline def ws(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')
    val out = new java.util.ArrayList[String](16)
    var segStart = 0
    var i = 0
    while (i < n) {
      if (ws(s.charAt(i))) {
        out.add(s.substring(segStart, i))
        i += 1
        while (i < n && ws(s.charAt(i))) i += 1
        segStart = i
      } else i += 1
    }
    if (segStart < n) out.add(s.substring(segStart)) // limit 0: drop trailing ""
    out.toArray(new Array[String](out.size))
  }

  def fastTokens(text: Column): Column =
    GraftBridge.column(FastTokens(GraftBridge.expression(text)))
}

/** `regexp_replace(text, "\s+", " ")` as one byte scan: every maximal
  * whitespace run — leading, inner, or trailing — becomes a single 0x20.
  * Output is at most input-length bytes, built in one pre-sized buffer.
  */
case class CollapseWhitespace(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "collapse_ws"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    while (i < n) {
      if (WsBytes.isWs(b(i))) {
        out(o) = 0x20; o += 1
        i += 1
        while (i < n && WsBytes.isWs(b(i))) i += 1
      } else { out(o) = b(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CollapseWhitespace {
  def collapseWs(text: Column): Column =
    GraftBridge.column(CollapseWhitespace(GraftBridge.expression(text)))
}

/** Shannon entropy (bits) of a token multiset, computed per row:
  *
  *   H = log2(n) - Σ c_t·log2(c_t) / n
  *
  * over the counts c_t of each distinct token. A document's entropy is a
  * function of that one document, so it belongs on the scan — the
  * explode → (doc, token) count → per-doc rollup formulation this replaced
  * paid two keyed shuffles of the full token stream for a value computable
  * in one pass over each row's array. Callers round (the Σ is
  * re-associated float addition either way).
  *
  * Null tokens (possible under a cast) count like any other distinct
  * value; an empty array yields 0.0 (n = 0 ⇒ no information, and the
  * tokenizer never produces one — `fast_tokens` emits [""] for empty
  * text, matching the SQL `\s+` split).
  */
case class TokenEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${dt.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else counts.merge(arr.getUTF8String(i), 1, Integer.sum _)
      i += 1
    }
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toDouble; acc += c * (math.log(c) / ln2) }
    if (nulls > 0) { val c = nulls.toDouble; acc += c * (math.log(c) / ln2) }
    math.log(n.toDouble) / ln2 - acc / n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEntropy {
  /** Per-row Shannon entropy (bits) over a token array. */
  def entropy(tokens: Column): Column =
    GraftBridge.column(TokenEntropy(GraftBridge.expression(tokens)))
}

/** "(c1)(c2)…" char-wrapping for the BPE symbol encoding, one pass.
  *
  * The column form — `array_join(transform(filter(split(w, ""), …), …))` —
  * walks the generic collection path: a per-char array, three traversals,
  * a concat allocation per char. On the corpus-wide encode scan that chain
  * alone measured ~0.7 s of the 1.1 s gate at sf0.1. This kernel appends
  * into one byte buffer.
  *
  * Wraps per Unicode CODE POINT; identical to the split-chain for any
  * input without surrogate pairs, and both BPE callers guard their input
  * to `[a-z]+` anyway ([[graft.ext.Bpe]]'s wordCounts filter / encode
  * branch), where it is byte-identical.
  */
case class WrapChars(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "wrap_chars"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length * 3)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.append('(').appendCodePoint(cp).append(')')
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WrapChars {
  /** "(c1)(c2)…" over a string column (BPE initial symbol sequence). */
  def wrapChars(text: Column): Column =
    GraftBridge.column(WrapChars(GraftBridge.expression(text)))
}
