package graft.udaf

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable KLL sketch buffer that serializes via the sketch's own compact
  * byte form. The aggregator keeps this holder as a live JVM object for
  * the whole partial-aggregation pass (ScalaAggregator is a
  * TypedImperativeAggregate — the encoder runs only at shuffle
  * boundaries), so per-row updates are O(1) amortized sketch updates,
  * not per-row serialize/deserialize round-trips.
  */
final class KllHolder(@transient var sk: KllDoublesSketch)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = sk.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    sk = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** Typed UDAF (SURVEY.md §2.4 A6 upgrade path / §2.10): KLL streaming
  * quantiles over an UNBOUNDED value domain — the sketch the fixed-bin
  * histogram form (`agg_quantile_partials`) cannot replace, because the
  * histogram needs a two-pass min/max extent while KLL needs no domain
  * knowledge at all. k = 200 gives ~1.65% normalized rank error at 99%
  * confidence in ~3 KB of state; partials build per partition and MERGE
  * associatively (the DataSketches mergeability theorem), which is
  * exactly the partial/final shape Catalyst gives builtin aggregates —
  * state is O(k log n), never O(n), at any scale. The estimates are
  * randomized (compaction coin flips), so queries must grade rank-error
  * BOUNDS, not exact values — `agg_quantile_kll` pins the empirical rank
  * of each served quantile within a generous 5% of target; GoldenSpec
  * pins the merge law (split-build-merge ranks ≡ single-build ranks
  * within twice the one-sketch bound).
  */
object KllQuantileAgg extends Aggregator[Double, KllHolder, Seq[Double]] {
  val K = 200
  /** Target ranks served by finish(), in output order. */
  val Ranks: Seq[Double] = Seq(0.50, 0.95, 0.99)

  override def zero: KllHolder =
    new KllHolder(KllDoublesSketch.newHeapInstance(K))

  override def reduce(b: KllHolder, v: Double): KllHolder = {
    b.sk.update(v)
    b
  }

  override def merge(a: KllHolder, b: KllHolder): KllHolder = {
    a.sk.merge(b.sk)
    a
  }

  override def finish(r: KllHolder): Seq[Double] =
    if (r.sk.isEmpty) Seq.empty
    else Ranks.map(q => r.sk.getQuantile(q))

  override def bufferEncoder: Encoder[KllHolder] =
    Encoders.javaSerialization(classOf[KllHolder])
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(KllQuantileAgg)

  def apply(c: Column): Column = asUdaf(c)
}
