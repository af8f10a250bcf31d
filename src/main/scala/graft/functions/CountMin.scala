package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Finished Count–Min sketch: row-major d×w counter matrix. */
case class CmsSketch(cells: Array[Long])

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
  * public): a d×w counter matrix; each item increments ONE counter per
  * row (row-seeded hash of the item) and a point estimate is the MIN over
  * the d counters the item maps to. Counters only ever gain colliding
  * mass, so the sketch NEVER underestimates: true ≤ est, and each row's
  * overcount is the colliding mass in that bucket (expected n/w for a
  * spread-out row; the min over d rows tightens it). Counters are linear,
  * so merge = elementwise sum and the sketch is partitioning-invariant —
  * the mergeable-summaries property that makes it a one-pass distributed
  * aggregate carrying O(partitions × d × w) counters through the shuffle
  * regardless of vocabulary size (vs the full vocabulary for exact
  * counts). Complements the family: Bloom = membership, Misra–Gries =
  * top items, CMS = point frequencies for ANY queried item.
  *
  * The hash family is the engine's deterministic [[Hashing.polyHash]]
  * with the same odd-multiplier row seeding the MinHash signatures use —
  * NOT seeded universal hashes. The deliberate trade: the textbook
  * probabilistic (ε, δ) guarantee becomes "engineering-grade spread on
  * non-adversarial text", and in exchange the sketch is a pure function
  * of the input multiset — so the SQL twin (`q_cms_counts` oracle)
  * rebuilds the IDENTICAL matrix in DuckDB and the cross-engine check is
  * exact, not statistical. The overestimate-only and merge-invariance
  * guarantees hold for ANY hash choice and are property-tested in
  * CmsSpec.
  */
object CountMin {
  final val D   = 4
  final val W   = 256
  final val Mod = 1000000007L

  /** Row-j bucket of a PolyHash value — the exact arithmetic the Column/
    * SQL twins use, so JVM, Spark-plan, and DuckDB sketches agree
    * cell-for-cell. h ∈ [0, Mod) keeps every product below 2^63.
    */
  def bucket(h: Long, j: Int): Int =
    ((h * (2 * j + 1) + 101L * j + 17) % Mod % W).toInt

  def hash(tok: String): Long =
    Hashing.polyHash(UTF8String.fromString(tok))

  /** Point-frequency estimate: min over the d counters `tok` maps to. */
  def estimate(sk: CmsSketch, tok: String): Long = {
    val h = hash(tok)
    var m = Long.MaxValue
    var j = 0
    while (j < D) { m = math.min(m, sk.cells(j * W + bucket(h, j))); j += 1 }
    m
  }
}

/** Typed one-pass CMS aggregation over a token column. */
class CountMinAgg extends Aggregator[String, CmsSketch, CmsSketch] {
  import CountMin._
  override def zero: CmsSketch = CmsSketch(new Array[Long](D * W))
  override def reduce(b: CmsSketch, tok: String): CmsSketch = {
    val h = hash(tok)
    var j = 0
    while (j < D) { b.cells(j * W + bucket(h, j)) += 1; j += 1 }
    b
  }
  override def merge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }
  override def finish(r: CmsSketch): CmsSketch = r
  override def bufferEncoder: Encoder[CmsSketch] = Encoders.kryo[CmsSketch]
  override def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
}
