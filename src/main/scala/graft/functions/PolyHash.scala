package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the library's portable polynomial string
  * hash — `poly_hash(s)` = fold over the characters of `s` of
  * `h → (h * 31 + codepoint) % 1e9+7`, the exact value of the SQL form
  * `aggregate(filter(split(s, ''), ch -> ch <> ''), 0L,
  * (h, ch) -> (h * 31 + ascii(ch)) % 1000000007)` that every token-hash /
  * fingerprint stage was built on (and that the DuckDB oracles replay
  * with `list_reduce`; PropertySpec pins the three-way equivalence).
  *
  * Why native (the same HigherOrderFunction-has-no-codegen rationale as
  * [[CosineSim]]): the SQL form materializes an array of one-character
  * strings and runs an interpreted lambda frame per CHARACTER — measured
  * 2.2 s for the token-hash stage at sf0.1, the single largest cost in
  * the shared near-dup index build. This expression is one arithmetic
  * loop over the UTF8String's bytes (ASCII fast path, no String or array
  * allocation), falling back to code-point iteration only when a
  * non-ASCII byte appears — `split('')` segments by code point and
  * `ascii()` returns the code point, so the fallback mirrors the HOF form
  * on non-ASCII text too.
  *
  * Null semantics: null string yields null.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    PolyHash.hashOf(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row — the loop lives in compiled Scala, which
    // whole-stage codegen invokes without boxing (long return, no nulls)
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash$$.MODULE$$.hashOf($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private val P = 1000000007L

  def hashOf(s: UTF8String): Long = {
    val nb = s.numBytes()
    var h = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b < 0) return hashOfWide(s) // non-ASCII byte: code-point path
      h = (h * 31 + b) % P
      i += 1
    }
    h
  }

  private def hashOfWide(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      h = (h * 31 + cp) % P
      off += Character.charCount(cp)
    }
    h
  }
}
