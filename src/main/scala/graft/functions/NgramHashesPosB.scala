package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the SECOND-MODULUS positional rolling
  * n-gram hash — `ngram_hashes_pos_b(tokh, n)` is [[NgramHashesPos]]'s
  * sibling under an independent (base, modulus) pair: each element is
  * first reduced mod P₂ = 998244353 (the public NTT prime), then folded
  * with `h ← (h·131 + t') mod P₂`.
  *
  * Why it exists (ADVICE r12, the collision-envelope finding): a
  * DESTRUCTIVE rewrite like dedup_substring_remove cannot key removal on
  * one mod-1e9+7 hash — at 100 TB the corpus holds ~10¹³ 50-token
  * windows, so by pigeonhole nearly every single-modulus value collides
  * and the pass would delete unrelated text. Requiring agreement on BOTH
  * moduli multiplies the key space to P₁·P₂ ≈ 10¹⁸·: identical spans
  * still agree on both by construction (zero recall loss), while an
  * unrelated window pair now collides with probability ~1/(P₁·P₂) —
  * at 10¹³ windows the expected falsely-removed text is
  * ~N²/(2·P₁·P₂) ≈ 5·10⁷ windows ≈ 0.0002% of corpus tokens, documented
  * and negligible where the single-modulus pass was corpus-fatal.
  *
  * Unlike the first-modulus sibling there is no out-of-domain fallback:
  * the fold REDUCES each element first (t' = ((t mod P₂)+P₂) mod P₂), so
  * the rolling recurrence h_{i+1} = ((h_i − t'_i·131^{n-1})·131 + t'_{i+n})
  * mod P₂ is exact for ANY long input and the expression is O(len)
  * unconditionally (PropertySpec pins the fold-twin equivalence; the
  * DuckDB oracles replay the reduce-then-fold form).
  *
  * A shorter-than-n input yields an EMPTY array; null input or a null
  * element yields null; `n` must be a foldable int in [2, 256].
  */
case class NgramHashesPosB(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes_pos_b"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def intLit(e: Expression): Option[Int] =
      if (e.foldable && e.dataType == IntegerType)
        Option(e.eval(null)).map(_.asInstanceOf[Int])
      else None
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<bigint> input, got ${left.dataType.sql}")
    else intLit(right) match {
      case Some(n) if n >= 2 && n <= 256 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable int n in [2, 256], got ${right.sql}")
    }
  }

  override def nullSafeEval(vec: Any, nV: Any): Any =
    NgramHashesPosB.combine(vec.asInstanceOf[ArrayData], nV.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      s"""
         |${ev.value} = graft.functions.NgramHashesPosB$$.MODULE$$.combine($a, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHashesPosB =
    copy(left = newLeft, right = newRight)
}

object NgramHashesPosB {
  private val P = 998244353L
  private val B = 131L

  /** Null iff a null element is hit; empty array iff fewer than n tokens. */
  def combine(x: ArrayData, n: Int): ArrayData = {
    val len = x.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val t = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (x.isNullAt(i)) return null
      val raw = x.getLong(i) % P
      t(i) = if (raw < 0L) raw + P else raw
      i += 1
    }
    // rolling: precompute B^(n-1) mod p, seed with the first window's
    // fold, then O(1) per slide — exact for any input because every
    // element was reduced into [0, P) above
    val out = new Array[Long](len - n + 1)
    var pw = 1L
    var k = 1
    while (k < n) { pw = (pw * B) % P; k += 1 }
    var h = t(0)
    k = 1
    while (k < n) { h = (h * B + t(k)) % P; k += 1 }
    out(0) = h
    i = 1
    while (i <= len - n) {
      val drop = (t(i - 1) * pw) % P
      h = (((h - drop + P) % P) * B + t(i + n - 1)) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
