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

  test("decontamination joins train grams against a BROADCAST test set") {
    // the train-side grams must meet the eval set via broadcast — a
    // sort-merge join here would shuffle the full training corpus's grams
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      s"train grams are being shuffled for the join:\n${p.take(1500)}")
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
