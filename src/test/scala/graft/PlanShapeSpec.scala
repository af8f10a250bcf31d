package graft

/** Locks in the physical-plan properties the engine relies on (SURVEY §4):
  * filter pushdown into parquet, column pruning, broadcast dimension joins,
  * top-k without a global sort. A regression here costs nothing at test
  * scale and everything at 100 TB.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("pricing summary pushes the date filter into the parquet scan") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"filter not pushed:\n${p.take(2000)}")
  }

  test("pricing summary prunes to only the needed lineitem columns") {
    val p = plan("q_agg_pricing_summary")
    val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_partkey"),
      s"column pruning regressed: $readSchema")
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q_join_broadcast_dims").contains("BroadcastHashJoin"))
    assert(plan("q_tpch_q5_region").contains("BroadcastHashJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!"(?<!Reused)(?<!Broadcast)Exchange".r.findAllIn(p).hasNext,
      "top-k should not shuffle")
  }

  test("deterministic sampling computes narrowly (no hash-partition shuffle)") {
    // the split predicate must stay a per-row expression that composes with
    // the scan: the ONLY allowed exchange is the rangepartitioning sort of
    // the final presentation ORDER BY (oracle-compare determinism), never a
    // hashpartitioning of the data itself
    val p = plan("q_sample_hash")
    assert(!p.contains("hashpartitioning"),
      s"sampling should not hash-shuffle:\n${p.take(1500)}")
  }

  test("decontamination carries no pinned broadcast of the eval-gram set") {
    // te (distinct eval grams) is corpus-proportional under the declared
    // 90/10 split — a pinned broadcast is exactly the 100 TB OOM shape.
    // The hint must stay OUT of the logical plan; AQE converts the join to
    // broadcast at runtime while the eval set measures genuinely small.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("q_decontaminate")(spark, sfDir)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, s"q_decontaminate pins ${hints.size} broadcast hint(s)")
    // join-before-dedup shape must survive: the per-doc aggregate sits
    // ABOVE the gram join, so bulk train grams are filtered by the join
    // before the countDistinct dedup ever shuffles them
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val aggAboveJoin = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.collectFirst { case j: Join => j }.nonEmpty => a
    }
    assert(aggAboveJoin.nonEmpty, "decontaminate lost its join-before-dedup shape")
  }

  test("broadcast hints appear only on provably bounded join sides") {
    // The analog of the no-global-window lock: an unconditional broadcast
    // hint on a data-proportional frame runs fine at sf0.1 and OOMs at
    // 100 TB. Only these queries may pin a broadcast, each with a
    // scale-invariance argument for the hinted side:
    //   - q_range_join_buckets: 4-row literal bucket dim
    //   - q_join_broadcast_dims / q_tpch_q5_region: nation (25) / region
    //     (5) — fixed-cardinality TPC-H dims, invariant under SF
    //   - q_tfidf_top_terms / q_unigram_logprob: single-row COUNT/SUM
    //     aggregates (corpus size / token mass)
    //   - q_vocab_coverage: per-distinct-count-value aggregate — counts sum
    //     to total token mass N, so distinct values are O(sqrt N) (~3M rows
    //     i.e. a few MB even at 100 TB) — plus a single-row total
    //   - similarity/ANN top-k family: the hinted side is the PROBE batch —
    //     the user-supplied query workload, bounded by construction (the
    //     fixture derives it as 1% of vec_ids only for testability)
    val allowed = Set(
      "q_range_join_buckets", "q_join_broadcast_dims", "q_tpch_q5_region",
      "q_tfidf_top_terms", "q_unigram_logprob", "q_vocab_coverage",
      "q_cosine_topk", "q_cosine_topk_ann", "q_ann_lsh_topk",
      "q_ann_screen_topk", "q_ann_ivf_topk")
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    SparkEntry.all.foreach { q =>
      val hints = q.build(spark, sfDir).queryExecution.analyzed.collect {
        case h: ResolvedHint => h
      }
      if (!allowed(q.name))
        assert(hints.isEmpty,
          s"${q.name} pins ${hints.size} broadcast hint(s) — either the side is " +
            "data-proportional (remove the hint, let AQE decide) or it is provably " +
            "bounded (add it to the allowlist above WITH the argument)")
    }
  }

  test("no declared query plans a cartesian product") {
    SparkEntry.all.foreach { q =>
      val p = q.build(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} went cartesian")
    }
  }

  test("no declared query uses a non-partitioned window") {
    // Window.orderBy with no partitionBy funnels every row through a single
    // task — the one plan shape that silently stops scaling (the round-1
    // q_simhash bug). Checked on the optimized logical plan so AQE wrapping
    // can't hide it.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.all.foreach { q =>
      val bad = q.build(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"${q.name} has a global (non-partitioned) window")
    }
  }
}
