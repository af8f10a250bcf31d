package graft

import org.apache.spark.sql.functions._

/** Lakehouse maintenance ops (ops/Lakehouse.scala): CDC merge equivalence
  * at arbitrary cutoffs, Z-order key roundtrip against an independent
  * bit-munging reference, and locality of the z curve.
  */
class LakehouseSpec extends SparkSpec {

  test("CDC upsert-merge equals full-history snapshot at every cutoff, not just the query's") {
    // the oracle checks one cutoff; the merge must hold for any split
    // point of an append-only log, including degenerate all-prev/all-batch
    val ev  = Tables.events(spark, sfDir)
    val full = ops.Lakehouse.snapshot(ev.transform(cl))
    Seq("2024-01-01 00:00:00", "2024-01-10 12:00:00", "2024-02-01 00:00:00")
      .foreach { c =>
        val cutoff = to_timestamp(lit(c))
        val merged = ops.Lakehouse.upsertMerge(
          ops.Lakehouse.snapshot(ev.filter(col("ts") < cutoff).transform(cl)),
          ev.filter(col("ts") >= cutoff).transform(cl))
        assert(merged.except(full).count() === 0 &&
          full.except(merged).count() === 0,
          s"incremental snapshot diverged from full recompute at cutoff $c")
      }
  }

  // mirror of Lakehouse.changelog (private) — the same op/payload mapping
  private def cl(ev: org.apache.spark.sql.DataFrame) =
    ev.select(col("user_id").as("k"), col("ts"), col("event_id"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("event_type").as("payload_type"),
      round(col("value") * 100).cast("long").as("value_cents"))

  /** Independent Morton reference: per-bit interleave (no magic masks). */
  private def zRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("z-order key equals a per-bit interleave reference and roundtrips") {
    val pairs = for (i <- 0 until 200) yield
      ((i * 2654435761L) % 65536L, (i * 40503L + 17L) % 65536L)
    import spark.implicits._
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ops.Lakehouse.zval(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z === zRef(a, b), s"zval($a,$b)=$z != reference ${zRef(a, b)}")
      // roundtrip: compress even/odd bits back out
      def compress(x: Long): Long = (0 until 16).foldLeft(0L) { (r, i) =>
        r | ((x >> (2 * i)) & 1L) << i
      }
      assert(compress(z) === a && compress(z >> 1) === b,
        s"z=$z does not decode back to ($a,$b)")
    }
  }

  test("z-order clusters 2-d ranges: a dim-aligned tile maps to a bounded z interval") {
    // the property row-group pruning relies on: for a power-of-two-aligned
    // tile, every point's z value lies within [zval(lo), zval(hi)] — so
    // min/max stats on z-sorted row groups can exclude the tile's
    // complement. (General rectangles need BIGMIN refinement; aligned
    // tiles bound exactly.)
    val (aLo, bLo, side) = (1024L, 2048L, 256L)
    val inTile = for (i <- 0 until 500) yield
      (aLo + (i * 7919L) % side, bLo + (i * 104729L) % side)
    import spark.implicits._
    val zs = inTile.toDF("a", "b")
      .select(ops.Lakehouse.zval(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val zMin = zRef(aLo, bLo)
    val zMax = zRef(aLo + side - 1, bLo + side - 1)
    zs.foreach(z => assert(z >= zMin && z <= zMax,
      s"z=$z escapes tile interval [$zMin,$zMax]"))
  }

  test("zone-map pruning is sound and effective on the z-ordered blocks") {
    import ops.Lakehouse._
    val blocks = SparkEntry.queries("q_zonemap_prune")(spark, sfDir).collect()
    // soundness: every predicate match sits in a scanned block
    blocks.foreach { b =>
      val (scanned, nMatch) = (b.getInt(6), b.getLong(7))
      assert(scanned == 1 || nMatch == 0L,
        s"block ${b.getLong(0)}: $nMatch matches in a pruned block")
    }
    // completeness: block match counts sum to the exact full-filter count
    val total = blocks.map(_.getLong(7)).sum
    val exact = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey").between(ZoneP1, ZoneP2) &&
        col("l_suppkey").between(ZoneS1, ZoneS2)).count()
    assert(total === exact)
    // effectiveness: the 2-d rectangle prunes a majority of blocks
    val scanned = blocks.count(_.getInt(6) == 1)
    assert(scanned * 2 < blocks.length,
      s"zone maps scanned $scanned of ${blocks.length} blocks — no skipping")
    // stats are real min/max envelopes
    blocks.foreach { b =>
      assert(b.getLong(2) <= b.getLong(3) && b.getLong(4) <= b.getLong(5))
    }
  }
}
