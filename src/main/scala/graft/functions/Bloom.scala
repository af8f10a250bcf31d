package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter sketch output: a flat bitset, `numBits/64` words. Kept as
  * `array<bigint>` (not binary) so the membership probe stays in pure
  * Column expressions — `element_at` + shifts are codegen'd; a binary
  * payload would force a custom expression or UDF for bit access.
  * (As a single-field product the aggregation output column IS the
  * `array<bigint>` — pass that column to [[Bloom.mightContain]] directly.)
  */
case class BloomSketch(bits: Array[Long])

/** Mergeable Bloom filter over long keys (Bloom 1970; the runtime-filter
  * join-pruning shape of Spark's own InjectRuntimeFilter / the classic
  * semi-join reduction, built here as a public, explicitly-placeable
  * operator).
  *
  * Build side: a typed [[Aggregator]] — each map task ORs keys into a local
  * bitset, the shuffle carries O(partitions) fixed-size sketches (16 KiB at
  * the default 2^17 bits), and partials merge by bitwise OR (order- and
  * partitioning-invariant, asserted in BloomSpec). Probe side: k pure
  * Column probes against the broadcast single-row sketch — no UDF, no
  * driver round-trip, prunes BEFORE the shuffle of a sort-merge join.
  *
  * Guarantee: NO false negatives (every inserted key probes true — the
  * build and probe sides compute bit positions from the same
  * `xxhash64(lit(i), key)` family, parity property-tested); false
  * positives occur at the standard (1-e^(-kn/m))^k rate and are removed
  * by the exact join that follows. The filter is therefore a pure
  * shuffle-volume optimization: plans with and without it return
  * identical rows (q_bloom_semi_join's oracle is the plain semi join).
  */
object Bloom {

  /** Bit position of probe `i` for key `v` — EXACTLY what the Column side's
    * `pmod(xxhash64(lit(i), key), numBits)` computes: Spark's XxHash64 over
    * children (lit(i), key) folds seeds left-to-right from 42, i.e.
    * `hashLong(v, hashLong(i, 42))`. Replicated here via the same
    * catalyst XXH64 kernel so Aggregator-set bits and Column-probed bits
    * agree bit-for-bit (BloomSpec locks the parity).
    */
  private[graft] def position(v: Long, i: Int, numBits: Int): Int =
    Math.floorMod(XXH64.hashLong(v, XXH64.hashLong(i.toLong, 42L)),
      numBits.toLong).toInt

  def agg(numBits: Int, numHashes: Int): TypedColumn[Long, BloomSketch] =
    new BloomAgg(numBits, numHashes).toColumn

  /** Membership probe: AND over k codegen'd bit tests. `bits` is the
    * `array<bigint>` bitset column (broadcast single-row sketch),
    * `key` a long column.
    */
  def mightContain(bits: Column, key: Column, numBits: Int,
      numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val pos  = pmod(xxhash64(lit(i.toLong), key), lit(numBits.toLong))
      val word = element_at(bits, (shiftright(pos, 6) + 1).cast("int"))
      call_function("shiftrightunsigned", word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}

class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, BloomSketch, BloomSketch] {
  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  def zero: BloomSketch = BloomSketch(new Array[Long](numBits / 64))

  def reduce(b: BloomSketch, a: Long): BloomSketch = {
    var i = 0
    while (i < numHashes) {
      val p = Bloom.position(a, i, numBits)
      b.bits(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
    b
  }

  def merge(b1: BloomSketch, b2: BloomSketch): BloomSketch = {
    var i = 0
    while (i < b1.bits.length) { b1.bits(i) |= b2.bits(i); i += 1 }
    b1
  }

  def finish(b: BloomSketch): BloomSketch = b

  // buffer crosses the partial/final shuffle as an opaque blob (kryo);
  // the OUTPUT must be a real ArrayType so mightContain can element_at it
  def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
  def outputEncoder: Encoder[BloomSketch] = Encoders.product[BloomSketch]
}
