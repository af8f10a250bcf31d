package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom, BloomSketch}

/** Guarantees of the mergeable Bloom sketch (functions/Bloom.scala):
  * build/probe hash parity (the no-false-negative precondition),
  * partitioning invariance of the OR-merge, and a bounded false-positive
  * rate. The q_bloom_semi_join oracle already proves result-invisibility;
  * these lock the sketch itself.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val NumBits   = 1 << 14
  private val NumHashes = 5

  test("JVM build-side positions equal the Column probe-side xxhash64 family") {
    // Bloom.position claims to replicate pmod(xxhash64(lit(i), key), m)
    // exactly — compute both for a key sample and every probe index
    val keys = (0L until 64L).map(k => k * 2654435761L % 100000L).distinct
    val fromColumns = keys.toDF("k").select(col("k"),
        array((0 until NumHashes).map(i =>
          pmod(xxhash64(lit(i.toLong), col("k")), lit(NumBits.toLong))): _*)
          .as("pos"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    keys.foreach { k =>
      (0 until NumHashes).foreach { i =>
        assert(Bloom.position(k, i, NumBits).toLong === fromColumns(k)(i),
          s"hash parity broken for key $k probe $i")
      }
    }
  }

  test("no false negatives: every inserted key probes true through the Column path") {
    val keys = spark.range(0, 2000).select((col("id") * 37 % 50000).as("k"))
    val sketch = keys.as[Long].select(Bloom.agg(NumBits, NumHashes)).toDF("bloom")
    val missed = keys.distinct().crossJoin(broadcast(sketch))
      .filter(!Bloom.mightContain(col("bloom"), col("k"), NumBits, NumHashes))
      .count()
    assert(missed === 0L, s"$missed inserted keys probed false")
  }

  test("OR-merge is partitioning-invariant: 1-partition and 13-partition builds agree") {
    val keys = spark.range(0, 3000).select((col("id") * 7919 % 100000).as("k"))
    def build(parts: Int): Array[Long] =
      keys.repartition(parts).as[Long]
        .select(Bloom.agg(NumBits, NumHashes))
        .collect().head.asInstanceOf[BloomSketch].bits
    assert(java.util.Arrays.equals(build(1), build(13)),
      "sketch bits differ across partitionings — merge is not order-invariant")
  }

  test("false-positive rate stays within 3x the analytic bound") {
    // n=2000 keys in m=2^14 bits with k=5: fp = (1 - e^(-kn/m))^k ~ 0.9%.
    // Probe 20k keys disjoint from the inserted domain (inserted keys are
    // all < 50000) and demand < 3x that — loose enough to be
    // deterministic-stable, tight enough to catch a broken hash family
    // (uniform-collapse puts fp near 1).
    val keys   = spark.range(0, 2000).select((col("id") * 37 % 50000).as("k"))
    val n      = keys.distinct().count().toDouble
    val sketch = keys.as[Long].select(Bloom.agg(NumBits, NumHashes)).toDF("bloom")
    val probes = spark.range(1000000, 1020000).select(col("id").as("k"))
    val fp = probes.crossJoin(broadcast(sketch))
      .filter(Bloom.mightContain(col("bloom"), col("k"), NumBits, NumHashes))
      .count().toDouble / 20000.0
    val bound = math.pow(1 - math.exp(-NumHashes * n / NumBits), NumHashes)
    assert(fp <= 3 * bound, f"fp rate $fp%.4f exceeds 3x analytic bound $bound%.4f")
  }
}
