package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: POSITIONAL rolling n-gram hash combine —
  * `ngram_hashes_pos(tokh, n)` returns one hash per window START POSITION
  * (index i holds `fold(t[i..i+n-1])`, NO dedup), where the fold is the
  * same `h ← t[i]; h ← (h·8191 + t[i+k]) mod 1e9+7` the distinct-set
  * sibling [[NgramHashes]] computes. The positional form is what
  * exact-substring REMOVAL needs (dedup_substring_remove): a flagged gram
  * maps back to the token range [pos, pos+n−1] it covers, which the
  * distinct-set form erases.
  *
  * Scale shape: the windows are computed by a TRUE ROLLING hash —
  * h_{i+1} = ((h_i − t[i]·8191^{n-1}) · 8191 + t[i+n]) mod p — so the
  * whole array costs O(len), not O(len·n); at n = 50 (the Lee et al.
  * span threshold) that is 16× less arithmetic per token than re-folding
  * each window, and it is why span detection at 100 TB costs the same
  * per token as the 3-gram shingle pass. The rolling recurrence is exact
  * mod p only on the poly_hash domain (0 ≤ t < p); out-of-domain
  * elements fall back to the per-window fold so the expression equals
  * the HOF `transform(sequence(0, size-n), i -> fold(...))` twin on ANY
  * input (PropertySpec pins the equivalence; the DuckDB oracles replay
  * the fold form).
  *
  * A shorter-than-n input yields an EMPTY array; null input or a null
  * element yields null; `n` must be a foldable int in [2, 256].
  */
case class NgramHashesPos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes_pos"

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
    NgramHashesPos.combine(vec.asInstanceOf[ArrayData], nV.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      s"""
         |${ev.value} = graft.functions.NgramHashesPos$$.MODULE$$.combine($a, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHashesPos =
    copy(left = newLeft, right = newRight)
}

object NgramHashesPos {
  private val P = 1000000007L
  private val B = 8191L

  /** Null iff a null element is hit; empty array iff fewer than n tokens. */
  def combine(x: ArrayData, n: Int): ArrayData = {
    val len = x.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val t = new Array[Long](len)
    var inDomain = true
    var i = 0
    while (i < len) {
      if (x.isNullAt(i)) return null
      t(i) = x.getLong(i)
      if (t(i) < 0L || t(i) >= P) inDomain = false
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    if (inDomain) {
      // rolling: precompute B^(n-1) mod p, seed with the first window's
      // fold, then O(1) per slide
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
    } else {
      // out-of-domain elements (not poly_hash outputs): per-window fold,
      // bit-identical to the HOF twin on any long input
      i = 0
      while (i <= len - n) {
        var h = t(i)
        var k = 1
        while (k < n) { h = (h * B + t(i + k)) % P; k += 1 }
        out(i) = h
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
