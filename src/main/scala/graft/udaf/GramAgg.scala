package graft.udaf

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Typed UDAF: exact int64 second-moment (Gram) + first-moment sums over
  * quantized embedding vectors — the one corpus-wide pass behind
  * embedding_pca_power's covariance.
  *
  * Why an Aggregator and not an explode: the d² outer-product terms never
  * need to exist as ROWS — a first cut exploded 4096 structs per vector
  * into a (i, j)-keyed hash agg and the struct churn alone cost 5.2 s at
  * sf0.1 (measured; 85% of the query). Here each vector folds into one
  * O(d²) long buffer in a tight loop, partials merge associatively, and
  * the shuffle carries ONE 33 KB buffer per map partition instead of
  * 4096 × partitions rows. At 100 TB this is the textbook one-pass
  * distributed covariance: O(N·d²) compute, O(d²) state, no row blowup.
  *
  * Cross-engine exactness: inputs are the 1e-3-grid quantized BIGINTs, so
  * every sum is an order-independent exact integer — the DuckDB twin's
  * sequential sums land on literally the same values (the same trick the
  * micro-integer score sums use; see pcaTrained's recipe).
  *
  * Overflow envelope: the sums HERE are not the binding constraint —
  * |sij| ≤ n·qmax² wraps only past n ≈ 2.7e13 vectors. The binding cliff
  * is the CONSUMER's centering products n·sij and si·sj (~5e6 vectors at
  * qmax ≈ 580), which is why the runtime guard lives in
  * LlmSimilarity.pcaGuardedMatSql, on the aggregated stats themselves,
  * and raises before any wrapped product can reach an eigenvector.
  */
case class GramBuf(gram: Array[Long], si: Array[Long], n: Long)
case class GramStats(gram: Seq[Long], si: Seq[Long], n: Long)

object GramAgg extends Aggregator[Seq[Long], GramBuf, GramStats] {
  override def zero: GramBuf = GramBuf(Array.empty[Long], Array.empty[Long], 0L)

  override def reduce(b: GramBuf, v: Seq[Long]): GramBuf = {
    if (v == null) return b
    val d = v.length
    val vv = v.toArray
    val out = if (b.si.isEmpty) GramBuf(new Array[Long](d * d), new Array[Long](d), 0L) else b
    var i = 0
    while (i < d) {
      out.si(i) += vv(i)
      val row = i * d
      var j = 0
      while (j < d) { out.gram(row + j) += vv(i) * vv(j); j += 1 }
      i += 1
    }
    GramBuf(out.gram, out.si, out.n + 1L)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    if (a.si.isEmpty) b
    else if (b.si.isEmpty) a
    else {
      var i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      var k = 0
      while (k < a.si.length) { a.si(k) += b.si(k); k += 1 }
      GramBuf(a.gram, a.si, a.n + b.n)
    }
  }

  override def finish(r: GramBuf): GramStats =
    GramStats(r.gram.toSeq, r.si.toSeq, r.n)

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramStats] = Encoders.product[GramStats]

  /** Column-function form: gram(quantizedVecCol). */
  val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(GramAgg, ExpressionEncoder[Seq[Long]]())

  def apply(c: Column): Column = asUdaf(c)
}
