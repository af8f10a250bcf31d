package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** The COMPOSED training-data pipeline, declared as one oracle-checked
  * query: every curation stage this engine ships, chained in the order a
  * production corpus build runs them —
  *
  *   documents
  *     → 1. dup-SPAN strip      (Lee et al. 2022 boilerplate removal:
  *           drop every token covered by a duplicated ≥[[Spans.SpanLen]]-
  *           token span; all copies drop — first-copy retention is the
  *           next stage's job)
  *     → 2. chunk dedup         (C4-style: keep each distinct chunk's
  *           first occurrence, reconstruct documents)
  *     → 3. SemDeDup keep-set   (drop docs whose embedding is a semantic
  *           dup of a lower-id same-cluster vector; docs without an
  *           embedding row pass through)
  *     → 4. C4/Gopher gates     (on the RECONSTRUCTED text — gates must
  *           judge what ships, not what arrived)
  *     → 5. domain mix          (temperature-reweighted source sampling
  *           over the SURVIVORS — rates from post-filter counts, or small
  *           domains get double-penalized)
  *     → 6. sequence packing    (global ordered prefix sum → context
  *           windows, the two-level scan)
  *     → 7. shard assignment    (deterministic shard + in-shard position)
  *
  * The oracle is a multi-statement DuckDB temp-table script (the
  * PageRank-oracle mechanism): each stage materializes once as a pf_*
  * TEMP TABLE, stage SQL shared with the per-stage oracles
  * (Spans.dupSpansCtes, TextOps.qualityKeepSql, Sampling.bucket100Sql,
  * Shards.shuffleKeySql), so the composition is checked cell-exact end to
  * end — not rows-only.
  *
  * Scale shape: the corpus is only ever shuffled on high-cardinality keys
  * (window content, chunk content, doc_id, cluster/cell, source-join) and
  * each stage's state is per-key bounded; the only driver-side material
  * is the packing stage's O(buckets) offsets. PlanShapeSpec locks the
  * composed plan's exchange count so a stage refactor cannot silently
  * introduce an extra corpus shuffle.
  */
object Pipeline {

  /** Stage 1: per-doc text with duplicated-span tokens removed. A doc
    * whose every token was covered vanishes (length-0 guard), matching
    * the oracle's empty string_agg group.
    */
  private[graft] def spanStripped(docs: DataFrame): DataFrame = {
    val spansPerDoc = Spans.dupSpansFrom(docs)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(spansPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ",
          when(col("spans").isNull, col("toks"))
            .otherwise(filter(col("toks"), (_, i) =>
              !exists(col("spans"), sp =>
                sp("span_start") <= i + 1 && sp("span_end") >= i + 1))))
          .as("text"))
      .filter(length(col("text")) > 0)
  }

  /** The full composed pipeline (stages 1–7 above). */
  def pipelineFull(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)

    // 1. span strip  2. chunk dedup + reconstruction
    val chunked = Curation.chunkDedupFrom(spanStripped(docs))
      .select(col("doc_id"), col("text_kept").as("text"))

    // 3. SemDeDup keep-set: anti-join against the dropped vec_ids — docs
    // without an embedding row survive by construction of the anti join
    val dropped = Similarity.semDedup(Tables.embeddings(s, dir), "label")
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    val sem = chunked.join(dropped, Seq("doc_id"), "left_anti")

    // 4. quality gates on the reconstructed text
    val gated = sem.filter(TextOps.qualityKeep(col("text")))

    // 5. domain mix over the survivors (rates from post-filter counts);
    // single-row totals are the allowlisted pinned-broadcast class.
    // localCheckpoint: the survivor frame feeds SIX downstream branches
    // (counts → totals → weights → Z → rates → the keep filter) — without
    // the barrier each branch re-plans (and without runtime exchange reuse
    // re-EXECUTES) the whole stage-1–4 pipeline: measured 89 exchanges in
    // the composed plan vs 5 with the barriers, upstream stages running
    // exactly once. Same lineage-fan-out hygiene as the CC/PageRank loops.
    val withSrc = gated.join(docs.select("doc_id", "source"), "doc_id")
      .localCheckpoint()
    val srcCounts = withSrc.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = srcCounts.agg(sum("n").cast("double").as("nd"))
    val wgt = srcCounts.crossJoin(broadcast(tot))
      .withColumn("wgt", sqrt(col("n") / col("nd")))
    val z = wgt.agg(sum("wgt").as("zsum"))
    val rates = wgt.crossJoin(broadcast(z))
      .withColumn("rate", round(least(lit(1.0),
        col("wgt") / col("zsum") * lit(Curation.MixTarget)
          * col("nd") / col("n")), 6))
      .select("source", "rate")
    // second barrier: `mixed` feeds both the packing scan (which also
    // collects the O(buckets) offsets at build time) and the shard window
    val mixed = withSrc.join(rates, "source")
      .filter(Sampling.bucket100(col("doc_id")) < col("rate") * 100)
      .localCheckpoint()

    // 6. sequence packing (two-level prefix scan — no global window)
    val packed = Curation.packedStartsFrom(
      mixed.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tok")))
      .withColumn("seq_first", expr(s"start_tok div ${Curation.Ctx}"))
      .withColumn("seq_last", expr(s"(start_tok + n_tok - 1) div ${Curation.Ctx}"))

    // 7. shard assignment (per-shard window, never global)
    val shards = Shards.shardAssign(mixed.select("doc_id"), Shards.NShards)

    packed.join(shards, "doc_id")
      .select(col("doc_id"), col("source"), col("n_tok"), col("start_tok"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + 1L).as("n_seqs"),
        col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  /** The end-to-end oracle: one temp-table statement per stage. */
  private def oracleScript: String =
    s"""CREATE OR REPLACE TEMP TABLE pf_spans AS
       |${Spans.dupSpansCtes}
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) + ${Spans.SpanLen - 1} AS BIGINT) AS span_end
       |FROM i GROUP BY doc_id, island;
       |CREATE OR REPLACE TEMP TABLE pf_stripped AS
       |  WITH tk AS (
       |    SELECT doc_id,
       |           unnest([struct_pack(p := i, t := toks[i])
       |                   for i in range(1, len(toks) + 1)]) AS u
       |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |  SELECT doc_id, string_agg(u.t, ' ' ORDER BY u.p) AS text
       |  FROM tk
       |  WHERE NOT EXISTS (SELECT 1 FROM pf_spans s
       |                    WHERE s.doc_id = tk.doc_id
       |                      AND u.p BETWEEN s.span_start AND s.span_end)
       |  GROUP BY doc_id;
       |CREATE OR REPLACE TEMP TABLE pf_chunks AS
       |  WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM pf_stripped),
       |  c AS (
       |    SELECT doc_id, f AS chunk_idx,
       |           array_to_string(list_slice(toks,
       |             f * ${Curation.ChunkLen} + 1,
       |             f * ${Curation.ChunkLen} + ${Curation.ChunkLen}), ' ') AS chunk
       |    FROM t, range(0, 256) r(f)
       |    WHERE f < CAST(ceil(len(toks) / ${Curation.ChunkLen}.0) AS BIGINT)),
       |  k AS (
       |    SELECT doc_id, chunk_idx, chunk,
       |           row_number() OVER (PARTITION BY chunk
       |                              ORDER BY doc_id, chunk_idx) AS rn
       |    FROM c)
       |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text
       |  FROM k WHERE rn = 1 GROUP BY doc_id;
       |CREATE OR REPLACE TEMP TABLE pf_dropped AS
       |  WITH n AS (
       |    SELECT vec_id, label AS cluster, embedding::DOUBLE[] AS v,
       |           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |    FROM embeddings)
       |  SELECT DISTINCT a.vec_id
       |  FROM n a JOIN n b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= ${Similarity.SemDedupTau};
       |CREATE OR REPLACE TEMP TABLE pf_gated AS
       |  SELECT c.doc_id, c.text FROM pf_chunks c
       |  WHERE NOT EXISTS (SELECT 1 FROM pf_dropped x WHERE x.vec_id = c.doc_id)
       |    AND ${TextOps.qualityKeepSql};
       |CREATE OR REPLACE TEMP TABLE pf_src AS
       |  SELECT g.doc_id, g.text, d.source
       |  FROM pf_gated g JOIN documents d USING (doc_id);
       |CREATE OR REPLACE TEMP TABLE pf_rates AS
       |  WITH s AS (SELECT source, count(*) AS n FROM pf_src GROUP BY source),
       |  tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nd FROM s),
       |  w AS (SELECT source, n, sqrt(n / nd) AS wgt FROM s, tot),
       |  z AS (SELECT sum(wgt) AS zsum FROM w)
       |  SELECT source,
       |         round(least(1.0, (wgt / zsum) * ${Curation.MixTarget} * nd / n), 6)
       |           AS rate
       |  FROM w, z, tot;
       |CREATE OR REPLACE TEMP TABLE pf_mix AS
       |  SELECT p.doc_id, p.text, p.source
       |  FROM pf_src p JOIN pf_rates r USING (source)
       |  WHERE ${Sampling.bucket100Sql("p.doc_id")} < r.rate * 100;
       |CREATE OR REPLACE TEMP TABLE pf_pack AS
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
       |         CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
       |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS start_tok
       |  FROM pf_mix;
       |SELECT doc_id, source, n_tok, start_tok,
       |       start_tok // ${Curation.Ctx} AS seq_first,
       |       (start_tok + n_tok - 1) // ${Curation.Ctx} AS seq_last,
       |       ((start_tok + n_tok - 1) // ${Curation.Ctx})
       |         - (start_tok // ${Curation.Ctx}) + 1 AS n_seqs,
       |       CAST(${Shards.shuffleKeySql("doc_id")} % ${Shards.NShards} AS BIGINT)
       |         AS shard,
       |       CAST(row_number() OVER (
       |         PARTITION BY ${Shards.shuffleKeySql("doc_id")} % ${Shards.NShards}
       |         ORDER BY ${Shards.shuffleKeySql("doc_id")}, doc_id) AS BIGINT) AS pos
       |FROM pf_pack ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_pipeline_full", oracleScript)(pipelineFull)
  )
}
