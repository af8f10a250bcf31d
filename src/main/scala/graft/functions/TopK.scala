package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the top-k aggregation: one scored candidate. */
case class ScoredCand(cos: Double, id: Long)

/** Final top-k result: parallel arrays sorted by (cos DESC, id ASC). */
case class TopKPairs(cs: Array[Double], ids: Array[Long])

/** Mutable bounded buffer — lives as a JVM object inside a partition
  * (TypedImperativeAggregate); Kryo-serialized only across the shuffle.
  */
final class TopKBuf(var cs: Array[Double], var ids: Array[Long], var n: Int)
    extends Serializable

/** Exact per-key top-k as a typed Aggregator with partial merge: each map
  * task keeps a k-element buffer per key, so the shuffle carries
  * O(partitions × keys × k) rows instead of every scored pair — the
  * difference between an all-pairs sort and a mergeable sketch. Ordering is
  * (cos DESC, id ASC), matching `row_number() OVER (ORDER BY cos DESC, id)`
  * on pre-rounded scores, so results are engine-deterministic.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredCand, TopKBuf, TopKPairs] {

  private def beats(c1: Double, i1: Long, c2: Double, i2: Long): Boolean =
    c1 > c2 || (c1 == c2 && i1 < i2)

  // buffers start small and DOUBLE up to k as rows actually arrive: with a
  // large k (the screen path uses k ≈ n/5) a partition often holds far
  // fewer than k candidates per key, and eagerly k-sized zero-padded
  // arrays would make every shuffled partial buffer k-sized regardless of
  // fill — more bytes than the pair shuffle the aggregator exists to avoid
  def zero: TopKBuf = {
    val cap = math.min(k, 16)
    new TopKBuf(new Array[Double](cap), new Array[Long](cap), 0)
  }

  def reduce(b: TopKBuf, a: ScoredCand): TopKBuf = {
    if (b.n < k || beats(a.cos, a.id, b.cs(b.n - 1), b.ids(b.n - 1))) {
      if (b.n == b.cs.length && b.n < k) {
        val cap = math.min(k, b.cs.length * 2)
        b.cs  = java.util.Arrays.copyOf(b.cs, cap)
        b.ids = java.util.Arrays.copyOf(b.ids, cap)
      }
      // insertion into a ≤k sorted array: find slot, shift tail right
      var i = if (b.n < k) b.n else k - 1
      while (i > 0 && beats(a.cos, a.id, b.cs(i - 1), b.ids(i - 1))) {
        b.cs(i) = b.cs(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
      }
      b.cs(i) = a.cos; b.ids(i) = a.id
      if (b.n < k) b.n += 1
    }
    b
  }

  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b2.n) { reduce(b1, ScoredCand(b2.cs(i), b2.ids(i))); i += 1 }
    b1
  }

  def finish(b: TopKBuf): TopKPairs =
    TopKPairs(b.cs.take(b.n), b.ids.take(b.n))

  def bufferEncoder: Encoder[TopKBuf]   = Encoders.kryo[TopKBuf]
  def outputEncoder: Encoder[TopKPairs] = Encoders.product[TopKPairs]
}
