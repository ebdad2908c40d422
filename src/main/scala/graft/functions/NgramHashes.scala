package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: distinct rolling n-gram hash combine —
  * `ngram_hashes(tokh, n)` returns the DISTINCT (first-occurrence order)
  * values of `fold(t[i..i+n-1])` over every window, where the fold is
  * `h ← t[i]; h ← (h·8191 + t[i+k]) mod 1e9+7` — exactly the
  * `array_distinct(transform(sequence(0, size-n), i -> ...))` HOF combine
  * that builds the 3-gram shingle sets (NearDup) and the contamination
  * 5-grams (Curation), and that the DuckDB oracles replay
  * (PropertySpec pins the equivalence for both n).
  *
  * Why native (the [[CosineSim]] rationale): this was the LAST interpreted
  * stage in the near-dup signature pipeline (tokens → poly_hash, shingles
  * → HERE, minhash → minhash_sigs, simhash → simhash_sig) — a lambda
  * frame per window plus array_distinct's O(n) SQL-equality pass. The
  * loop lives in [[NgramHashes.combine]] (compiled Scala, LinkedHashSet
  * dedup), invoked as one static call per row from generated code —
  * Janino's subset of Java makes an inline generic-collection loop more
  * fragile than the call, and the win is dropping per-window frames.
  *
  * A shorter-than-n input yields an EMPTY array (the HOF form's
  * `IF(size >= n, ..., array())` guard, folded in so callers drop the
  * conditional). Null input or a null element yields null. `n` must be a
  * foldable int in [2, 8].
  */
case class NgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes"

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
      case Some(n) if n >= 2 && n <= 8 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable int n in [2, 8], got ${right.sql}")
    }
  }

  override def nullSafeEval(vec: Any, nV: Any): Any =
    NgramHashes.combine(vec.asInstanceOf[ArrayData], nV.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      s"""
         |${ev.value} = graft.functions.NgramHashes$$.MODULE$$.combine($a, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHashes =
    copy(left = newLeft, right = newRight)
}

object NgramHashes {
  /** Null iff a null element is hit; empty array iff fewer than n tokens. */
  def combine(x: ArrayData, n: Int): ArrayData = {
    val len = x.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      if (x.isNullAt(i)) return null
      var h = x.getLong(i)
      var k = 1
      while (k < n) {
        if (x.isNullAt(i + k)) return null
        h = (h * 8191L + x.getLong(i + k)) % 1000000007L
        k += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
