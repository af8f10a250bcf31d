package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Q

/** Graph centrality over the near-duplicate graph: PageRank (Brin & Page
  * 1998) on the qualifying-pair edge list the MinHash pipeline already
  * produces. Ranking duplicated content by centrality is the curation
  * counterpart of the degree histogram (q_neardup_degree): a high-PR node
  * is boilerplate shared across many otherwise-unrelated documents — the
  * first thing to drop — where a low-PR clique is one page mirrored a few
  * times.
  *
  * Iteration layout is the standard distributed PageRank: per round one
  * keyed join (edges ⋈ ranks on the source) and one groupBy on the
  * destination — shuffles key on vertex ids, state is the O(V) rank frame,
  * rounds are a fixed small constant. No global window, no driver-side
  * graph.
  *
  * Cross-engine exactness (this is the first ORACLE-CHECKED iterative
  * operator — connected components is rows-only): ranks live in integer
  * MICRO-units. Each round a node's outgoing share is the floor-divided
  * `pr div deg` (exact), incoming shares sum as integers (exact, order-
  * free), and the damped update rounds back to micro BEFORE the next round
  * — so both engines walk the identical integer trajectory and the DuckDB
  * oracle (the same recurrence unrolled as CTEs) matches cell-for-cell.
  * The damping product `0.85 * Σ` is one correctly-rounded IEEE op on an
  * exact integer < 2^53, identical in both engines by IEEE-754.
  */
object Graph {

  /** Fixed PageRank rounds (unrolled in the oracle SQL). */
  final val PrIters = 3

  /** PageRank over an undirected (d1, d2) pair list, as the integer-micro
    * recurrence documented above. Every node in the pair list has deg ≥ 1,
    * so there are no dangling nodes.
    *
    * Iterative-loop hygiene (same pattern as the CC loop,
    * [[Corpus]]): the edge list materializes ONCE via localCheckpoint,
    * pre-partitioned by the per-round join key (so each round's big join
    * reuses the edge partitioning and only rank rows move), and each
    * round's rank frame checkpoints to truncate lineage — without this the
    * upstream pair plan (the whole MinHash pipeline) re-executes per round
    * per lineage branch and the loop goes super-linear (measured 463 s at
    * ScaleProbe x50 vs 33 s with the checkpoints).
    */
  private[graft] def pageRank(pairs: DataFrame, iters: Int = PrIters): DataFrame = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint()
    val edges = p.select(col("d1").as("v"), col("d2").as("w"))
      .union(p.select(col("d2").as("v"), col("d1").as("w")))
      .repartition(col("v")).localCheckpoint()
    val deg = edges.groupBy("v").agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("nn")) // single-row: allowlisted class
    var r = deg.crossJoin(broadcast(n))
      .select(col("v"), col("deg"), col("nn"),
        round(lit(1000000.0) / col("nn")).cast("long").as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges.join(r.select(col("v"), expr("pr div deg").as("c")), "v")
        .groupBy(col("w").as("v")).agg(sum("c").as("csum"))
      r = deg.crossJoin(broadcast(n))
        .join(contrib, Seq("v"), "left")
        .select(col("v"), col("deg"), col("nn"),
          round(lit(150000.0) / col("nn")
            + lit(0.85) * coalesce(col("csum"), lit(0L))).cast("long").as("pr"))
        .localCheckpoint()
    }
    r.select(col("v").as("doc_id"), col("deg"), col("pr").as("pr_micro"))
  }

  /** One unrolled oracle round: rPrev → rK. */
  private def roundSql(prev: String, k: String): String =
    s"""$k AS (
       |  SELECT d.v, d.deg,
       |         CAST(round(150000.0 / nt.nn + 0.85 * coalesce(s.c, 0)) AS BIGINT) AS pr
       |  FROM deg_t d CROSS JOIN nt LEFT JOIN (
       |    SELECT e.w AS v, CAST(sum($prev.pr // $prev.deg) AS BIGINT) AS c
       |    FROM e JOIN $prev ON $prev.v = e.v GROUP BY e.w) s ON s.v = d.v)""".stripMargin

  val queries: Seq[Q] = Seq(

    // The graph is the VERTEX-INDUCED SUBGRAPH on doc_id % 4 = 0: pair
    // qualification is purely pairwise, so Spark filters the full pair
    // output while the oracle pushes the same restriction into the
    // pipeline source — identical graphs by construction. The restriction
    // exists for the ORACLE's cost model, not the engine's: DuckDB 1.0
    // re-evaluates a CTE at every reference (MATERIALIZED or not,
    // measured), and the unrolled rounds reference the edge CTEs ~18
    // times — on the regenerated dense corpus (~0.9M qualifying pairs at
    // sf0.1) that is ~18 × 10 s of pipeline re-derivation for what the
    // engine computes once. The engine-side operator (ops/Graph.pageRank)
    // is restriction-free; q_neardup_degree / q_dedup_minhash_pairs keep
    // oracle-checking the FULL pipeline, and the full-graph PageRank path
    // stays covered by GraphSpec's sequential-recurrence equality.
    Q("q_pagerank_neardup",
      s"""${Dedup.minhashPairsCtesWhere(" WHERE doc_id % 4 = 0")}, e AS (
         |  SELECT d1 AS v, d2 AS w FROM pairs_t
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM pairs_t),
         |deg_t AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY v),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg_t),
         |r0 AS (
         |  SELECT v, deg, CAST(round(1000000.0 / nn) AS BIGINT) AS pr
         |  FROM deg_t, nt),
         |${(1 to PrIters).map(i => roundSql(s"r${i - 1}", s"r$i")).mkString(",\n")}
         |SELECT v AS doc_id, deg, pr AS pr_micro FROM r$PrIters
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      pageRank(Dedup.minhashPairs(s, dir)
        .filter(col("d1") % 4 === 0 && col("d2") % 4 === 0)
        .select("d1", "d2")).orderBy("doc_id")
    }
  )
}
