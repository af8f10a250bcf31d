package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

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

  /** Checkpoint-fusion hygiene (the CC loop's pattern,
    * [[Corpus]].componentsOf): build a checkpoint chain with AQE DISABLED
    * and the checkpoints LAZY. AdaptiveSparkPlan.doExecute materializes
    * its query stages eagerly at `toRdd`, so under AQE even a lazy
    * localCheckpoint runs its shuffles as separate driver-blocking jobs at
    * build time; with the toggle + `eager = false` the whole chain
    * executes inside the consumer's ONE action (stages still parallel;
    * lineage still truncated — the 463 s vs 33 s ScaleProbe blow-up the
    * checkpoints exist for cannot return). The builder's output wraps
    * checkpoint RDDs, so the toggle cannot leak into the consumer's own
    * execution.
    *
    * MEASURED DECISION (round 15, sf0.1): applied to [[triangleCounts]]
    * only (3.8 → 1.4 s; its joins are large self-joins AQE would not
    * improve). The ROUND loops (labelProp/pageRank/ppr/kCore/kTruss) keep
    * their eager per-round checkpoints: under AQE-off their per-round
    * label/contrib/support joins lose the runtime small-side broadcast
    * conversion and regress outright (kTruss 6.2 → 15.2 s, kCore
    * 5.3 → 9.4 s measured).
    */
  private def lazyLoop(spark: org.apache.spark.sql.SparkSession)
      (body: => DataFrame): DataFrame = {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  /** Fixed label-propagation rounds (q_labelprop). */
  final val LpIters = 4

  /** Bounded-hop min-label propagation over an undirected pair list:
    * label₀(v) = v; each round label(v) ← min(label(v), min over
    * neighbors). After R rounds label(v) = min vertex id within graph
    * distance R — the oracle-checkable bounded form of connected
    * components (the pointer-jumping CC in [[Corpus]] converges fully but
    * is rows-only; this walks a FIXED integer trajectory both engines
    * reproduce cell-for-cell, and GraphSpec shows it converges to the CC
    * labels once rounds reach the graph diameter). Same loop hygiene as
    * [[pageRank]]: edges checkpoint once pre-partitioned on the join key,
    * labels checkpoint per round; per round one keyed join + one groupBy.
    */
  private[graft] def labelProp(pairs: DataFrame, iters: Int = LpIters): DataFrame = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint()
    val edges = p.select(col("d1").as("v"), col("d2").as("w"))
      .union(p.select(col("d2").as("v"), col("d1").as("w")))
      .repartition(col("v")).localCheckpoint()
    var lbl = edges.select(col("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint()
    for (_ <- 1 to iters) {
      val nb = edges.join(lbl, "v")
        .groupBy(col("w").as("v")).agg(min("lbl").as("nmin"))
      lbl = lbl.join(nb, Seq("v"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    lbl.select(col("v").as("doc_id"), col("lbl"))
  }

  /** One unrolled label-prop oracle round as a temp-table statement. */
  private def lpRoundSql(prev: String, k: String): String =
    s"""CREATE OR REPLACE TEMP TABLE $k AS
       |  SELECT l.v, least(l.lbl, coalesce(m.nmin, l.lbl)) AS lbl
       |  FROM $prev l LEFT JOIN (
       |    SELECT e.w AS v, min(r.lbl) AS nmin
       |    FROM lp_e e JOIN $prev r ON r.v = e.v GROUP BY e.w) m
       |  ON m.v = l.v;""".stripMargin

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
    // Loop-INVARIANT state materializes ONCE (round 16): deg and nn are
    // pure functions of the checkpointed edge list, but referencing their
    // PLANS inside the loop re-ran the E-sized degree aggregation and the
    // nn broadcast chain in EVERY round's checkpoint job (measured at
    // sf0.1: 1.79M directed edges × PrIters redundant agg passes). One
    // V-sized checkpoint (still partitioned on v, so the per-round join
    // with contrib stays exchange-free) removes them; the per-round values
    // are bit-identical — same integers from the same aggregation.
    val deg = edges.groupBy("v").agg(count(lit(1)).as("deg"))
    val degN = deg
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("nn")))) // single-row
      .localCheckpoint()
    var r = degN
      .select(col("v"), col("deg"), col("nn"),
        round(lit(1000000.0) / col("nn")).cast("long").as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges.join(r.select(col("v"), expr("pr div deg").as("c")), "v")
        .groupBy(col("w").as("v")).agg(sum("c").as("csum"))
      r = degN
        .join(contrib, Seq("v"), "left")
        .select(col("v"), col("deg"), col("nn"),
          round(lit(150000.0) / col("nn")
            + lit(0.85) * coalesce(col("csum"), lit(0L))).cast("long").as("pr"))
        .localCheckpoint()
    }
    r.select(col("v").as("doc_id"), col("deg"), col("pr").as("pr_micro"))
  }

  /** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom 2002): the
    * teleport vector is concentrated on a SEED set — here one hub per
    * source (highest near-dup degree, ties to the lowest doc id), so the
    * stationary mass reads "how much of each source's duplication
    * neighborhood does this document sit in". Same exact integer-micro
    * trajectory as [[pageRank]] — the only change is the base term
    * 0.15·10⁶/|S| paid to seeds instead of 0.15·10⁶/n to everyone.
    */
  private[graft] def pprSeeded(pairs: DataFrame, docs: DataFrame,
      iters: Int = PrIters): DataFrame = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint()
    val edges = p.select(col("d1").as("v"), col("d2").as("w"))
      .union(p.select(col("d2").as("v"), col("d1").as("w")))
      .repartition(col("v")).localCheckpoint()
    val deg = edges.groupBy("v").agg(count(lit(1)).as("deg"))
    // one seed per source: max (deg, lowest id) — |sources|-bounded frame
    val seeds = deg.join(docs.select(col("doc_id").as("v"), col("source")), "v")
      .groupBy("source")
      .agg(max(struct(col("deg"), (-col("v")).as("nv"))).as("m"))
      .select((-col("m.nv")).as("v"))
    val ns = seeds.agg(count(lit(1)).as("ns")) // single-row: allowlisted class
    val sd = seeds.withColumn("is_seed", lit(true))
    // loop-invariant base frame checkpointed ONCE (the pageRank rationale):
    // deg/ns/sd are functions of the checkpointed edges+docs, and inlining
    // their plans in the loop re-ran the E-sized degree agg, the seed
    // derivation and both broadcasts every round. Values are identical.
    val base = deg.crossJoin(broadcast(ns))
      .join(broadcast(sd), Seq("v"), "left")
      .select(col("v"), col("deg"), col("ns"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint()
    var r = base
      .select(col("v"), col("deg"), col("ns"), col("is_seed"),
        when(col("is_seed"),
          round(lit(1000000.0) / col("ns")).cast("long"))
          .otherwise(lit(0L)).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges.join(r.select(col("v"), expr("pr div deg").as("c")), "v")
        .groupBy(col("w").as("v")).agg(sum("c").as("csum"))
      r = base
        .join(contrib, Seq("v"), "left")
        .select(col("v"), col("deg"), col("ns"), col("is_seed"),
          round(when(col("is_seed"),
            lit(150000.0) / col("ns")).otherwise(lit(0.0))
            + lit(0.85) * coalesce(col("csum"), lit(0L))).cast("long").as("pr"))
        .localCheckpoint()
    }
    r.select(col("v").as("doc_id"), col("deg"), col("is_seed"),
      col("pr").as("ppr_micro"))
  }

  /** One unrolled personalized round: pp_r{k-1} → pp_r{k}. */
  private def pprRoundSql(prev: String, k: String): String =
    s"""CREATE OR REPLACE TEMP TABLE $k AS
       |  SELECT d.v, d.deg,
       |         CAST(round(CASE WHEN sd.v IS NOT NULL THEN 150000.0 / nt.ns
       |                         ELSE 0.0 END
       |                    + 0.85 * coalesce(s.c, 0)) AS BIGINT) AS pr
       |  FROM pp_deg d CROSS JOIN pp_ns nt
       |  LEFT JOIN pp_seed sd ON sd.v = d.v
       |  LEFT JOIN (
       |    SELECT e.w AS v, CAST(sum(r.pr // r.deg) AS BIGINT) AS c
       |    FROM pp_e e JOIN $prev r ON r.v = e.v GROUP BY e.w) s ON s.v = d.v;""".stripMargin

  /** One unrolled oracle round as a MATERIALIZED temp-table statement:
    * pr_r{k-1} → pr_r{k}.
    */
  private def roundSql(prev: String, k: String): String =
    s"""CREATE OR REPLACE TEMP TABLE $k AS
       |  SELECT d.v, d.deg,
       |         CAST(round(150000.0 / nt.nn + 0.85 * coalesce(s.c, 0)) AS BIGINT) AS pr
       |  FROM pr_deg d CROSS JOIN pr_n nt LEFT JOIN (
       |    SELECT e.w AS v, CAST(sum(r.pr // r.deg) AS BIGINT) AS c
       |    FROM pr_e e JOIN $prev r ON r.v = e.v GROUP BY e.w) s ON s.v = d.v;""".stripMargin

  val queries: Seq[Q] = Seq(

    // FULL-graph PageRank, oracle-checked. The oracle is a multi-statement
    // DuckDB script (probed: DuckDB 1.0's `sql()` AND `execute()` both run
    // `;`-separated scripts and return the last statement's frame): each
    // stage lands in a CREATE OR REPLACE TEMP TABLE, so the LSH pair
    // pipeline and each PageRank round MATERIALIZE exactly once. This is
    // what lifts the former doc_id % 4 = 0 vertex-induced-subgraph
    // restriction (rounds 1–6): with plain CTEs, DuckDB 1.0 re-evaluates
    // the pair pipeline per reference (~18× across the unrolled rounds) —
    // with temp tables the full ~0.9M-pair graph at sf0.1 derives once,
    // same as the engine. Table names are pr_-prefixed so scripts sharing
    // the driver's connection cannot collide.
    Q("q_pagerank_neardup",
      s"""CREATE OR REPLACE TEMP TABLE pr_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE pr_e AS
         |  SELECT d1 AS v, d2 AS w FROM pr_pairs
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM pr_pairs;
         |CREATE OR REPLACE TEMP TABLE pr_deg AS
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM pr_e GROUP BY v;
         |CREATE OR REPLACE TEMP TABLE pr_n AS
         |  SELECT CAST(count(*) AS BIGINT) AS nn FROM pr_deg;
         |CREATE OR REPLACE TEMP TABLE pr_r0 AS
         |  SELECT v, deg, CAST(round(1000000.0 / nn) AS BIGINT) AS pr
         |  FROM pr_deg, pr_n;
         |${(1 to PrIters).map(i => roundSql(s"pr_r${i - 1}", s"pr_r$i")).mkString("\n")}
         |SELECT v AS doc_id, deg, pr AS pr_micro FROM pr_r$PrIters
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      pageRank(Dedup.minhashPairs(s, dir).select("d1", "d2")).orderBy("doc_id")
    },

    // PERSONALIZED PageRank from per-source hub seeds (see [[pprSeeded]]),
    // oracle-checked on the full graph via the same unrolled temp-table
    // trajectory as q_pagerank_neardup — the seed indicator joins into
    // every round's base term, everything else is the proven integer
    // recurrence. Curation read: a document with high seeded mass but a
    // DIFFERENT source than the seed it drains from is cross-source
    // contamination (q_neardup_cross_source's ranking twin).
    Q("q_ppr_seeded",
      s"""CREATE OR REPLACE TEMP TABLE pp_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE pp_e AS
         |  SELECT d1 AS v, d2 AS w FROM pp_pairs
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM pp_pairs;
         |CREATE OR REPLACE TEMP TABLE pp_deg AS
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM pp_e GROUP BY v;
         |CREATE OR REPLACE TEMP TABLE pp_seed AS
         |  SELECT v FROM (
         |    SELECT g.v, row_number() OVER (PARTITION BY d.source
         |             ORDER BY g.deg DESC, g.v) AS rn
         |    FROM pp_deg g JOIN documents d ON d.doc_id = g.v)
         |  WHERE rn = 1;
         |CREATE OR REPLACE TEMP TABLE pp_ns AS
         |  SELECT CAST(count(*) AS BIGINT) AS ns FROM pp_seed;
         |CREATE OR REPLACE TEMP TABLE pp_r0 AS
         |  SELECT g.v, g.deg,
         |         CASE WHEN sd.v IS NOT NULL
         |              THEN CAST(round(1000000.0 / nt.ns) AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS pr
         |  FROM pp_deg g CROSS JOIN pp_ns nt
         |  LEFT JOIN pp_seed sd ON sd.v = g.v;
         |${(1 to PrIters).map(i => pprRoundSql(s"pp_r${i - 1}", s"pp_r$i")).mkString("\n")}
         |SELECT r.v AS doc_id, r.deg, (sd.v IS NOT NULL) AS is_seed,
         |       r.pr AS ppr_micro
         |FROM pp_r$PrIters r LEFT JOIN pp_seed sd ON sd.v = r.v
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      pprSeeded(Dedup.minhashPairs(s, dir).select("d1", "d2"),
        Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Bounded-hop min-label propagation over the full near-dup graph —
    // after LpIters rounds each node carries the smallest doc_id within
    // LpIters hops. Deterministic integer trajectory (min/least only), so
    // the unrolled temp-table oracle matches cell-for-cell; GraphSpec
    // additionally proves convergence to the exact connected-component
    // min-ids once rounds reach the diameter.
    Q("q_labelprop",
      s"""CREATE OR REPLACE TEMP TABLE lp_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE lp_e AS
         |  SELECT d1 AS v, d2 AS w FROM lp_pairs
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM lp_pairs;
         |CREATE OR REPLACE TEMP TABLE lp_l0 AS
         |  SELECT DISTINCT v, v AS lbl FROM lp_e;
         |${(1 to LpIters).map(i => lpRoundSql(s"lp_l${i - 1}", s"lp_l$i")).mkString("\n")}
         |SELECT v AS doc_id, lbl FROM lp_l$LpIters
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      labelProp(Dedup.minhashPairs(s, dir).select("d1", "d2"))
        .orderBy("doc_id")
    },

    // Per-vertex triangle counts on the near-dup graph via degree-ordered
    // orientation (Suri & Vassilvitskii 2011, "Counting triangles and the
    // curse of the last reducer"): every undirected edge points from its
    // lower (deg, id) endpoint to the higher, so each triangle is emitted
    // exactly once at its unique apex and wedge work is Σ outdeg² with
    // outdeg = O(√E) — the hot-vertex quadratic blowup of a naive
    // neighborhood self-join cannot happen. A vertex's triangle count is
    // its local clustering numerator: boilerplate mirrored across many
    // docs forms dense triangle-rich cores the curation pass drops first.
    // Pure integer plan (degrees, ids, counts) — cell-exact cross-engine.
    Q("q_triangle_count",
      s"""CREATE OR REPLACE TEMP TABLE tc_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE tc_deg AS
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT d1 AS v FROM tc_pairs
         |    UNION ALL SELECT d2 AS v FROM tc_pairs)
         |  GROUP BY v;
         |CREATE OR REPLACE TEMP TABLE tc_o AS
         |  SELECT CASE WHEN (a.deg, p.d1) < (b.deg, p.d2)
         |              THEN p.d1 ELSE p.d2 END AS src,
         |         CASE WHEN (a.deg, p.d1) < (b.deg, p.d2)
         |              THEN p.d2 ELSE p.d1 END AS dst
         |  FROM tc_pairs p JOIN tc_deg a ON a.v = p.d1
         |                  JOIN tc_deg b ON b.v = p.d2;
         |CREATE OR REPLACE TEMP TABLE tc_t AS
         |  SELECT w1.src AS apex, w1.dst AS x, w2.dst AS y
         |  FROM tc_o w1 JOIN tc_o w2
         |    ON w1.src = w2.src AND w1.dst < w2.dst
         |  JOIN tc_o c
         |    ON least(c.src, c.dst) = w1.dst
         |   AND greatest(c.src, c.dst) = w2.dst;
         |SELECT d.v AS doc_id, d.deg,
         |       CAST(coalesce(t.n, 0) AS BIGINT) AS n_tri
         |FROM tc_deg d LEFT JOIN (
         |  SELECT v, count(*) AS n FROM (
         |    SELECT unnest([apex, x, y]) AS v FROM tc_t) GROUP BY v) t
         |ON t.v = d.v
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      triangleCounts(Dedup.minhashPairs(s, dir).select("d1", "d2"))
        .orderBy("doc_id")
    },

    // Local CLUSTERING COEFFICIENT per vertex (Watts & Strogatz 1998):
    // 2·triangles / (deg·(deg−1)), in exact integer permille — rides the
    // degree-ordered triangle machinery above, adding only the ratio.
    // The curation read sharpens the triangle one: coefficient ≈ 1000
    // says the neighborhood is a CLIQUE (one boilerplate blob — keep one
    // exemplar), high degree with LOW coefficient says hub-like template
    // reuse across unrelated docs (drop the template, keep the docs).
    Q("q_clustering_coeff",
      s"""CREATE OR REPLACE TEMP TABLE cc2_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE cc2_deg AS
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT d1 AS v FROM cc2_pairs
         |    UNION ALL SELECT d2 AS v FROM cc2_pairs)
         |  GROUP BY v;
         |CREATE OR REPLACE TEMP TABLE cc2_o AS
         |  SELECT CASE WHEN (a.deg, p.d1) < (b.deg, p.d2)
         |              THEN p.d1 ELSE p.d2 END AS src,
         |         CASE WHEN (a.deg, p.d1) < (b.deg, p.d2)
         |              THEN p.d2 ELSE p.d1 END AS dst
         |  FROM cc2_pairs p JOIN cc2_deg a ON a.v = p.d1
         |                   JOIN cc2_deg b ON b.v = p.d2;
         |CREATE OR REPLACE TEMP TABLE cc2_t AS
         |  SELECT w1.src AS apex, w1.dst AS x, w2.dst AS y
         |  FROM cc2_o w1 JOIN cc2_o w2
         |    ON w1.src = w2.src AND w1.dst < w2.dst
         |  JOIN cc2_o c
         |    ON least(c.src, c.dst) = w1.dst
         |   AND greatest(c.src, c.dst) = w2.dst;
         |SELECT d.v AS doc_id, d.deg,
         |       CAST(coalesce(t.n, 0) AS BIGINT) AS n_tri,
         |       CAST(CASE WHEN d.deg >= 2
         |            THEN coalesce(t.n, 0) * 2000 // (d.deg * (d.deg - 1))
         |            ELSE 0 END AS BIGINT) AS coeff_permille
         |FROM cc2_deg d LEFT JOIN (
         |  SELECT v, count(*) AS n FROM (
         |    SELECT unnest([apex, x, y]) AS v FROM cc2_t) GROUP BY v) t
         |ON t.v = d.v
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      triangleCounts(Dedup.minhashPairs(s, dir).select("d1", "d2"))
        .select(col("doc_id"), col("deg"), col("n_tri"),
          when(col("deg") >= 2,
            expr("n_tri * 2000 div (deg * (deg - 1))"))
            .otherwise(lit(0L)).as("coeff_permille"))
        .orderBy("doc_id")
    },

    // k-CORE of the near-dup graph (Seidman 1983; distributed peel à la
    // Montresor et al.): repeatedly remove vertices with fewer than K
    // neighbors among the survivors. The core that remains is the
    // mutually-duplicated mass — boilerplate cliques a curation pass
    // should collapse to one exemplar, where peeled fringe vertices are
    // ordinary pages with a few copies. K is data-derived, half the
    // average degree (Σdeg div 2V — exact integer both engines). The
    // declared semantics is a FIXED [[KcIters]]-round peel so the
    // unrolled temp-table oracle walks the identical trajectory; 8
    // rounds reaches the true fixpoint at every shipped scale (probed
    // sf0.001/0.01/0.1 → rounds 2/5/8; GraphSpec asserts round
    // [[KcIters]] = round [[KcIters]]+1 so a corpus regen that breaks
    // the bound fails loudly). Per round: one alive-semi-join per
    // endpoint + one degree groupBy, all keyed on vertex ids; state is
    // the O(V) alive set, checkpointed per round (the PageRank loop
    // hygiene).
    // DEGREE ASSORTATIVITY of the near-dup graph (Newman 2002, "Assortative
    // mixing in networks"; the networkx convention — Pearson correlation
    // of the degrees at either end of each directed edge): positive =
    // dup-heavy documents cluster with each other (boilerplate cliques),
    // negative = hub-and-spoke copying (one template, many one-off
    // copies). Exactness needs NO snapping: degrees and all five moment
    // sums are exact integers (deg ≤ cluster size, Σxy ≪ 2⁶³ at every
    // shipped scale); the single float step — num / sqrt(vx·vy), each
    // factor cast int→double — is a fixed sequence of correctly-rounded
    // IEEE ops, identical in both engines, then round(6). A regular
    // graph (vx = 0) yields NULL via nullif in both. Scale: two
    // vertex-keyed joins + one 6-column aggregate — no new shape beyond
    // the degree machinery the graph suite already has.
    Q("q_degree_assortativity",
      s"""CREATE OR REPLACE TEMP TABLE da_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE da_e AS
         |  SELECT d1 AS v, d2 AS w FROM da_pairs
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM da_pairs;
         |CREATE OR REPLACE TEMP TABLE da_deg AS
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM da_e GROUP BY 1;
         |WITH xy AS (
         |  SELECT dv.deg AS x, dw.deg AS y
         |  FROM da_e e JOIN da_deg dv ON dv.v = e.v
         |              JOIN da_deg dw ON dw.v = e.w)
         |SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
         |       round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
         |             / nullif(sqrt(
         |                 CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
         |                 * CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)),
         |               0), 6) AS assortativity
         |FROM xy""".stripMargin) { (s, dir) =>
      degreeAssortativity(Dedup.minhashPairs(s, dir).select("d1", "d2"))
    },

    // WINDOWED degree assortativity — the same Newman coefficient per
    // event-time hour over the user↔item interaction graph of the events
    // stream (edge = (user_id, props.k), item ids offset into a disjoint
    // vertex namespace). This is the BATCH TWIN of
    // streaming.Streams.assortativityPerWindow: the identical plan — two
    // windowed aggregates, ONE window-equality join (the SQL oracle's
    // second join is the batch-only formulation; the streaming chain
    // folds it into the per-head moment aggregate, Streams.scala), one
    // re-windowed closing aggregate — runs unchanged as a Structured
    // Streaming job four stateful operators deep (StreamingSpec proves
    // batch ≡ stream
    // on an out-of-order multi-trigger edge feed), so oracle-green here
    // certifies the streaming operator's arithmetic too. Exactness: the
    // q_degree_assortativity convention (exact integer moments, one fixed
    // IEEE step, round 6, nullif for regular windows).
    Q("q_assortativity_windowed",
      """WITH e0 AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS window_us,
        |         user_id AS v,
        |         -1 - CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
        |  FROM events),
        |dirr AS (
        |  SELECT window_us, v, w FROM e0
        |  UNION ALL
        |  SELECT window_us, w AS v, v AS w FROM e0),
        |deg AS (
        |  SELECT window_us, v, CAST(count(*) AS BIGINT) AS deg
        |  FROM dirr GROUP BY 1, 2),
        |xy AS (
        |  SELECT d.window_us, dv.deg AS x, dw.deg AS y
        |  FROM dirr d
        |  JOIN deg dv ON dv.window_us = d.window_us AND dv.v = d.v
        |  JOIN deg dw ON dw.window_us = d.window_us AND dw.v = d.w)
        |SELECT window_us, CAST(count(*) AS BIGINT) AS n_endpoints,
        |       round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |             / nullif(sqrt(
        |                 CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
        |                 * CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)),
        |               0), 6) AS assortativity
        |FROM xy GROUP BY window_us ORDER BY window_us""".stripMargin) { (s, dir) =>
      // Item vertices live in the NEGATIVE id half-space (w = -1 - k):
      // a sign split keeps the user/item namespaces disjoint for ALL
      // non-negative ids — no "user_id < offset" bound to outgrow at
      // production scale (both id families are generator-nonnegative).
      val edges = Tables.events(s, dir).select(col("ts"),
        col("user_id").as("v"),
        (lit(-1L) - get_json_object(col("props"), "$.k").cast("long")).as("w"))
      graft.streaming.Streams.assortativityPerWindow(edges)
        .orderBy("window_us")
    },

    Q("q_kcore_neardup",
      s"""CREATE OR REPLACE TEMP TABLE kc_pairs AS
         |${Dedup.minhashPairsCtes}
         |SELECT d1, d2 FROM pairs_t;
         |CREATE OR REPLACE TEMP TABLE kc_e AS
         |  SELECT d1 AS v, d2 AS w FROM kc_pairs
         |  UNION ALL
         |  SELECT d2 AS v, d1 AS w FROM kc_pairs;
         |CREATE OR REPLACE TEMP TABLE kc_k AS
         |  SELECT CAST(count(*) // (2 * greatest(count(DISTINCT v), 1)) AS BIGINT) AS k
         |  FROM kc_e;
         |CREATE OR REPLACE TEMP TABLE kc_a0 AS
         |  SELECT DISTINCT v FROM kc_e;
         |${(1 to KcIters).map(i => kcRoundSql(s"kc_a${i - 1}", s"kc_a$i")).mkString("\n")}
         |SELECT a.v AS doc_id, CAST(count(*) AS BIGINT) AS core_deg,
         |       (SELECT k FROM kc_k) AS k
         |FROM kc_a$KcIters a JOIN kc_e e ON e.v = a.v
         |                    JOIN kc_a$KcIters b ON b.v = e.w
         |GROUP BY a.v ORDER BY doc_id""".stripMargin) { (s, dir) =>
      kCore(Dedup.minhashPairs(s, dir).select("d1", "d2")).orderBy("doc_id")
    },

    // K-TRUSS (Cohen 2008, "Trusses: cohesive subgraphs for social
    // network analysis") over the 128-BIT FINGERPRINT pair graph:
    // iteratively drop edges supported by fewer than K−2 triangles — a
    // STRICTER cohesion filter than k-core (every surviving edge sits in
    // K−2 strong ties, so hub-and-spoke template chains fall away and
    // only genuine mirror cliques survive; the sf0.01 peel 363 → 67 → 35
    // shows exactly that pruning). The graph choice is a MEASURED plan
    // decision: on the jac ≥ 0.9 minhash doc graph the synthetic dup
    // families are ~600-strong near-cliques (279M triangles at sf0.1 —
    // avg support 312), so exact edge-support there costs Ω(triangles) ≈
    // 16 s/ROUND with the best plan (SHUFFLE_HASH + AQE-off, 172 s
    // hintless) and the peel removes 0.1% per round — truss cohesion is
    // the wrong question for a clique blow-up; the ham ≤ 8 fingerprint
    // graph (q_simhash_pairs128's) is the tight-tie graph the operator
    // is FOR. Support counts are schedule-free (each round's survivor
    // set is a pure function of the previous round's edge SET), so the
    // engine enumerates triangles degree-ordered (Σ outdeg² wedge bound)
    // while the oracle walks the same rounds id-ordered — identical
    // trajectories. Unrolled KtIters rounds; GraphSpec asserts fixpoint
    // at the bound AND agreement with a sequential truss peel. Scale
    // shape per round: one degree groupBy, one wedge join, one
    // closing-edge join, one support groupBy — all vertex/edge-keyed.
    Q("q_ktruss",
      s"""CREATE OR REPLACE TEMP TABLE kt_wd AS
         |${Dedup.simhash128WordsSql}
         |CREATE OR REPLACE TEMP TABLE kt_e0 AS
         |  SELECT a.doc_id AS v1, b.doc_id AS v2, CAST(0 AS BIGINT) AS sup
         |  FROM kt_wd a JOIN kt_wd b ON b.doc_id > a.doc_id
         |  WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
         |        + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
         |        <= ${Dedup.Sim128Tau};
         |${(1 to KtIters).map(i => ktRoundSql(s"kt_e${i - 1}", s"kt_e$i")).mkString("\n")}
         |SELECT v1 AS d1, v2 AS d2, sup FROM kt_e$KtIters
         |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      kTruss(Dedup.simhash128Pairs(s, dir)
        .select("d1", "d2")).orderBy("d1", "d2")
    }
  )

  /** Truss order: edges must close K−2 triangles to survive a peel round. */
  final val KtK = 6

  /** Fixed truss peel rounds (fixpoint by round 3 at every shipped scale —
    * the near-dup graph is clique-dominated, so support barely cascades).
    */
  final val KtIters = 4

  /** One unrolled truss peel round as a temp-table statement. */
  private def ktRoundSql(prev: String, next: String): String =
    s"""CREATE OR REPLACE TEMP TABLE $next AS
       |  WITH t AS (
       |    SELECT e1.v1 AS a, e1.v2 AS b, e2.v2 AS c
       |    FROM $prev e1 JOIN $prev e2 ON e2.v1 = e1.v1 AND e2.v2 > e1.v2
       |    JOIN $prev e3 ON e3.v1 = e1.v2 AND e3.v2 = e2.v2),
       |  s AS (
       |    SELECT u.v1, u.v2, CAST(count(*) AS BIGINT) AS sup FROM (
       |      SELECT a AS v1, b AS v2 FROM t
       |      UNION ALL SELECT a, c FROM t
       |      UNION ALL SELECT b, c FROM t) u
       |    GROUP BY 1, 2)
       |  SELECT e.v1, e.v2, s.sup
       |  FROM $prev e JOIN s ON s.v1 = e.v1 AND s.v2 = e.v2
       |  WHERE s.sup >= ${KtK - 2};""".stripMargin

  /** Per-edge triangle supports over a canonical (v1 < v2) edge frame via
    * the degree-ordered wedge enumeration (each triangle found once at its
    * lowest-(deg, id) apex, then attributed to all three canonical edges).
    */
  private def edgeSupports(ec: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = ec
      .join(deg.select(col("v").as("v1"), col("deg").as("deg1")), "v1")
      .join(deg.select(col("v").as("v2"), col("deg").as("deg2")), "v2")
    val fwd = struct(col("deg1"), col("v1")) < struct(col("deg2"), col("v2"))
    val oriented = withDeg.select(
      when(fwd, col("v1")).otherwise(col("v2")).as("src"),
      when(fwd, col("v2")).otherwise(col("v1")).as("dst"))
    // SHUFFLE_HASH pins on the wedge self-join and the closing-edge join:
    // clique hubs make both DENSE equal-key joins (runs of ~clique-size on
    // both sides), where SMJ pays its buffered re-scan per OUTPUT row —
    // the q_tfidf_cosine_pairs pathology. Measured on the 894k-edge,
    // 279M-triangle minhash doc graph at sf0.1: hintless 172 s → pinned
    // 63 s for the 4-round peel (that graph was then rejected as the
    // declared substrate — see q_ktruss); on the declared fingerprint
    // graph the pins are neutral and AQE (left ON) coalesces the tiny
    // per-round stages (21 s AQE-off → 5 s warm).
    val tris = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")).hint("SHUFFLE_HASH"),
        "src")
      .filter(col("x") < col("y"))
      .join(ec.select(col("v1").as("x"), col("v2").as("y")).hint("SHUFFLE_HASH"),
        Seq("x", "y"))
    tris.select(explode(array(
        struct(least(col("src"), col("x")).as("v1"),
          greatest(col("src"), col("x")).as("v2")),
        struct(least(col("src"), col("y")).as("v1"),
          greatest(col("src"), col("y")).as("v2")),
        struct(col("x").as("v1"), col("y").as("v2")))).as("e"))
      .select(col("e.v1"), col("e.v2"))
      .groupBy("v1", "v2").agg(count(lit(1)).as("sup"))
  }

  /** Fixed-round truss peel over an undirected (d1, d2) pair list — the
    * engine side of q_ktruss. Loop hygiene: the edge frame checkpoints
    * per round, AQE is toggled off for the loop body (the componentsOf
    * rationale — per-round re-planning of pre-sized tiny stages is pure
    * overhead), and the support frame IS the next edge frame: an edge
    * with zero triangles never appears in the support aggregation, so
    * `sup >= K-2` (K ≥ 3) filters the inner-join semantics for free —
    * no join back to the edge list.
    */
  private[graft] def kTruss(pairs: DataFrame, iters: Int = KtIters): DataFrame = {
    var ec = pairs
      .select(least(col("d1"), col("d2")).as("v1"),
        greatest(col("d1"), col("d2")).as("v2"))
      .distinct().repartition(col("v1")).localCheckpoint()
    // INITIAL-degree vertex order, computed once (round 16). Orientation by
    // ANY fixed strict total order on vertices enumerates each triangle of
    // the current edge set exactly once at its unique minimal apex, and an
    // edge's support (the count of triangles containing it) is
    // orientation-INDEPENDENT — so peeling with the round-0 (deg, v) order
    // walks the identical survivor trajectory as recomputing degrees per
    // round (GraphSpec's sequential-peel agreement stays the proof). The
    // old per-round recompute paid an E-sized union+agg per round purely to
    // rebuild the order; the Σ outdeg² wedge bound only tightens as edges
    // drop (out-neighborhoods shrink monotonically under a fixed order).
    val deg0 = ec.select(col("v1").as("v")).union(ec.select(col("v2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")).localCheckpoint()
    var out = ec.withColumn("sup", lit(0L))
    for (_ <- 1 to iters) {
      out = edgeSupports(ec, deg0)
        .filter(col("sup") >= KtK - 2)
        .localCheckpoint()
      ec = out.select("v1", "v2")
    }
    out.select(col("v1").as("d1"), col("v2").as("d2"), col("sup"))
  }

  /** Fixed k-core peel rounds (fixpoint by round 8 at every shipped scale;
    * see q_kcore_neardup).
    */
  final val KcIters = 8

  /** Degree-Pearson over directed edge endpoints — the engine side of
    * q_degree_assortativity (see the query comment for the exactness
    * argument).
    */
  private[graft] def degreeAssortativity(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("d1").as("v"), col("d2").as("w"))
      .union(pairs.select(col("d2").as("v"), col("d1").as("w")))
    val deg = e.groupBy("v").agg(count(lit(1)).as("deg"))
    // Moment folding (round 15): the straightforward xy formulation joins
    // deg onto the E-sized directed edge list TWICE (x then y — two
    // exchanges + sorts of |E| rows). Grouping each edge's contribution by
    // its SOURCE vertex needs only ONE E-sized join: v is a source exactly
    // deg(v) times, so over directed edges Σx = Σ_v deg², Σx² = Σ_v deg³,
    // n = Σ_v deg, and Σxy = Σ_v deg(v)·s(v) with s(v) = Σ_{w∈N(v)} deg(w)
    // (one join on w + one vertex-keyed groupBy); the remaining join is
    // V-sized. The y-moments equal the x-moments EXACTLY (both-ways union:
    // in-multiset = out-multiset), but sy/syy stay separate columns so the
    // final expression is the identical IEEE op sequence as the oracle —
    // the integer inputs are equal, so the result is bit-for-bit the same.
    val s = e.join(deg.select(col("v").as("w"), col("deg").as("dw")), "w")
      .groupBy("v").agg(sum("dw").as("sw"))
    deg.join(s, "v")
      .agg(sum("deg").as("n_endpoints"),
        sum(expr("deg * sw")).as("sxy"),
        sum(expr("deg * deg")).as("sx"), sum(expr("deg * deg")).as("sy"),
        sum(expr("deg * deg * deg")).as("sxx"),
        sum(expr("deg * deg * deg")).as("syy"))
      .select(col("n_endpoints"),
        round(expr("CAST(n_endpoints * sxy - sx * sy AS DOUBLE)") /
          expr("nullif(sqrt(CAST(n_endpoints * sxx - sx * sx AS DOUBLE)" +
            " * CAST(n_endpoints * syy - sy * sy AS DOUBLE)), 0D)"), 6)
          .as("assortativity"))
  }

  /** One unrolled k-core peel round as a temp-table statement. */
  private def kcRoundSql(prev: String, k: String): String =
    s"""CREATE OR REPLACE TEMP TABLE $k AS
       |  SELECT e.v FROM kc_e e
       |  JOIN $prev x ON x.v = e.v JOIN $prev y ON y.v = e.w
       |  GROUP BY e.v HAVING count(*) >= (SELECT k FROM kc_k);""".stripMargin

  /** Fixed-round k-core peel over an undirected (d1, d2) pair list — the
    * engine side of q_kcore_neardup. Same loop hygiene as [[pageRank]]:
    * edges checkpoint once pre-partitioned on the join key; the alive set
    * checkpoints per round.
    */
  private[graft] def kCore(pairs: DataFrame, iters: Int = KcIters): DataFrame = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint()
    // Round-15 note: an attempted "one edge exchange per round" reorder
    // (w-partitioned edge copy, w-semi first) MEASURED SLOWER (5.3 →
    // 7.1 s build): AQE already broadcasts the ≤|V|-row alive frame into
    // both semi-joins at runtime, so the v-partitioned loop below is
    // exchange-free per round (the groupBy(v) reuses the edge
    // partitioning) — there was nothing to save, and the reorder's
    // groupBy(v) over a w-partitioned copy ADDED an edge-sized exchange.
    val edges = p.select(col("d1").as("v"), col("d2").as("w"))
      .union(p.select(col("d2").as("v"), col("d1").as("w")))
      .repartition(col("v")).localCheckpoint()
    // greatest(..., 1): a degenerate empty pair graph must yield k = 0 in
    // BOTH engines (DuckDB's // errors on zero; Spark's div nulls) — same
    // empty-corpus convention as Corpus.componentsLoop's coalesced labelSum.
    // Checkpointed ONCE (round 16): kf is a pure function of the
    // checkpointed edge list, but inlining its plan in the loop re-ran the
    // E-sized count(DISTINCT v) aggregation (two exchanges over 1.79M
    // directed rows at sf0.1) inside EVERY peel round's checkpoint job and
    // again in the final degree pass — KcIters+1 redundant passes. The
    // single-row value is identical.
    val kf = edges.agg(
      expr("count(1) div (2 * greatest(count(DISTINCT v), 1))").as("k"))
      .localCheckpoint()
    var alive = edges.select("v").distinct().localCheckpoint()
    for (_ <- 1 to iters) {
      alive = edges
        .join(alive, Seq("v"), "left_semi")
        .join(alive.select(col("v").as("w")), Seq("w"), "left_semi")
        .groupBy("v").agg(count(lit(1)).as("d"))
        .crossJoin(broadcast(kf)) // single-row scalar: allowlisted class
        .filter(col("d") >= col("k"))
        .select("v").localCheckpoint()
    }
    val aliveW = alive.select(col("v").as("w"))
    edges
      .join(alive, Seq("v"), "left_semi")
      .join(aliveW, Seq("w"), "left_semi")
      .groupBy("v").agg(count(lit(1)).as("core_deg"))
      .crossJoin(broadcast(kf))
      .select(col("v").as("doc_id"), col("core_deg"), col("k"))
  }

  /** Per-vertex triangle counts over an undirected (d1, d2) pair list via
    * the degree-ordered orientation documented on q_triangle_count. The
    * pair frame checkpoints once (it is the whole MinHash pipeline); the
    * wedge join and the closing-edge join both key on vertex ids.
    */
  private[graft] def triangleCounts(pairs: DataFrame): DataFrame =
      lazyLoop(pairs.sparkSession) {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint(false)
    val deg = p.select(col("d1").as("v")).union(p.select(col("d2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = p
      .join(deg.select(col("v").as("d1"), col("deg").as("deg1")), "d1")
      .join(deg.select(col("v").as("d2"), col("deg").as("deg2")), "d2")
    val fwd = struct(col("deg1"), col("d1")) < struct(col("deg2"), col("d2"))
    val oriented = withDeg.select(
      when(fwd, col("d1")).otherwise(col("d2")).as("src"),
      when(fwd, col("d2")).otherwise(col("d1")).as("dst"))
      .localCheckpoint(false) // reused three times in the wedge + closing joins
    val tri = oriented.as("w1")
      .join(oriented.as("w2"),
        col("w1.src") === col("w2.src") && col("w1.dst") < col("w2.dst"))
      .join(oriented.as("c"),
        least(col("c.src"), col("c.dst")) === col("w1.dst") &&
          greatest(col("c.src"), col("c.dst")) === col("w2.dst"))
      .select(col("w1.src").as("apex"), col("w1.dst").as("x"),
        col("w2.dst").as("y"))
    val perVertex = tri
      .select(explode(array(col("apex"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("deg"),
        coalesce(col("n"), lit(0L)).as("n_tri"))
    }
}
