package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant tests for the curation operators (sequence packing, chunk
  * dedup, domain mixing) beyond the cell-exact DuckDB oracle: the packing
  * really is a partition of the global token stream, the two-level prefix
  * sum equals the (test-only) global-window cumsum, chunk dedup's output
  * is globally duplicate-free and reconstructible, and mixing rates are
  * well-formed sampling rates.
  */
class CurationSpec extends SparkSpec {

  private def pack = SparkEntry.all.find(_.name == "q_seq_pack").get
    .build(spark, sfDir)

  test("sequence packing tiles the token stream: exclusive prefix sum, no gaps") {
    // global window is fine IN A TEST — it is the oracle twin of the
    // two-level scan, not the production plan
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = pack
      .withColumn("want", coalesce(sum("n_tok").over(w), lit(0L)))
    assert(expect.filter(col("start_tok") =!= col("want")).count() === 0)
    // the last doc's start+len equals the corpus token mass: nothing lost
    val mass = pack.agg(sum("n_tok")).head.getLong(0)
    val end  = pack.agg(max(col("start_tok") + col("n_tok"))).head.getLong(0)
    assert(mass === end)
    assert(pack.agg(min("start_tok")).head.getLong(0) === 0L)
  }

  test("sequence ids are consistent with starts and the context length") {
    val bad = pack.filter(
      col("seq_first") =!= expr(s"start_tok div ${ops.Curation.Ctx}") ||
      col("seq_last") =!=
        expr(s"(start_tok + n_tok - 1) div ${ops.Curation.Ctx}") ||
      col("n_seqs") < 1)
    assert(bad.count() === 0)
  }

  test("chunk dedup output is globally duplicate-free and chunk-aligned") {
    val out = SparkEntry.all.find(_.name == "q_chunk_dedup").get
      .build(spark, sfDir)
    // every surviving chunk is exactly ChunkLen tokens (except each doc's
    // final partial), so re-chunking the reconstructed text re-yields the
    // kept chunk multiset — which must be globally distinct
    val rechunk = out.select(col("doc_id"), split(col("text_kept"), " ").as("toks"))
      .select(posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / ${ops.Curation.ChunkLen}.0) as int) - 1)," +
        s" f -> concat_ws(' ', slice(toks, f * ${ops.Curation.ChunkLen} + 1, ${ops.Curation.ChunkLen})))"))
        .as(Seq("chunk_idx", "chunk")))
    val n  = rechunk.count()
    val nd = rechunk.select("chunk").distinct().count()
    assert(n === nd, s"duplicate chunks survived dedup: $n vs $nd distinct")
    // kept-chunk counts match the reconstruction
    val m = out.filter(col("n_kept") =!=
      ceil(size(split(col("text_kept"), " ")) / lit(ops.Curation.ChunkLen.toDouble)).cast("long"))
    assert(m.count() === 0)
  }

  test("domain mixing rates are valid and kept counts are hash-consistent") {
    val out = SparkEntry.all.find(_.name == "q_domain_mix_temp").get
      .build(spark, sfDir)
    assert(out.filter(col("rate") <= 0 || col("rate") > 1).count() === 0)
    assert(out.filter(col("n_kept") > col("n_docs")).count() === 0)
    // temperature < 1 flattens: smaller sources keep a HIGHER fraction
    val fr = out.select(col("source"), col("n_docs"),
      (col("n_kept") / col("n_docs")).as("frac"),
      col("rate")).collect()
    val bySize = fr.sortBy(_.getLong(1))
    // rates (not realized fractions, which carry hash noise) must be
    // monotonically non-increasing in source size
    bySize.sliding(2).foreach { case Array(s, l) =>
      assert(s.getDouble(3) >= l.getDouble(3) - 1e-12,
        s"rate not flattening: ${s} vs ${l}")
    }
  }

  test("domain caps: per-source kept counts bounded, ranks are permutations") {
    val out = SparkEntry.all.find(_.name == "q_domain_caps").get
      .build(spark, sfDir)
    // no source keeps more than the cap
    val over = out.filter(col("kept"))
      .groupBy("source").count()
      .filter(col("count") > ops.Curation.DomainCap)
    assert(over.count() === 0)
    // within each source, ranks are exactly 1..n (a permutation)
    val bad = out.groupBy("source").agg(
      count(lit(1)).as("n"), min("rnk").as("lo"),
      max("rnk").as("hi"), countDistinct("rnk").as("nd"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("nd") =!= col("n"))
    assert(bad.count() === 0)
    // kept docs dominate dropped docs by length within a source: the
    // shortest kept doc is >= the longest dropped doc (ties broken by id)
    val kmin = out.filter(col("kept")).groupBy("source")
      .agg(min("n_chars").as("kmin"))
    val dmax = out.filter(!col("kept")).groupBy("source")
      .agg(max("n_chars").as("dmax"))
    val inv = kmin.join(dmax, "source")
      .filter(col("kmin") < col("dmax"))
    assert(inv.count() === 0)
  }

  test("char entropy: ln(k)-bounded on the corpus, exact on uniform fixtures") {
    val ent = SparkEntry.all.find(_.name == "q_char_entropy").get
      .build(spark, sfDir)
    // bound: 0 <= ent_per_char_micro <= ln(n_distinct_chars) * 1e6 + 1
    val bad = ent.filter(col("ent_per_char_micro") < 0 ||
      col("ent_per_char_micro") >
        log(col("n_distinct_chars").cast("double")) * 1e6 + lit(1.0))
    assert(bad.count() === 0)
    // hand fixture through the same arithmetic (micro-nat snapping):
    // uniform over k symbols → per-char entropy ln(k) in micro-nats
    def entOf(text: String): Double = {
      val n = text.length
      val tot = text.groupBy(identity).values.map { g =>
        val nc = g.length
        -nc.toLong * math.round(math.log(nc.toDouble / n) * 1e6)
      }.sum
      tot.toDouble / n
    }
    assert(entOf("aaaaaaaa") === 0.0)
    assert(math.abs(entOf("abababab") - math.log(2) * 1e6) <= 1.0)
    assert(math.abs(entOf("abcdabcd") - math.log(4) * 1e6) <= 1.0)
  }

  test("boilerplate strip equals a sequential df-threshold reference") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val L = ops.Curation.ChunkLen
    def chunksOf(text: String): Seq[String] =
      text.split(" ").toSeq.grouped(L).map(_.mkString(" ")).toSeq
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, _, t) =>
      chunksOf(t).foreach(c => df(c) = df.getOrElse(c, Set.empty[Long]) + id) }
    val boiler = df.filter(_._2.size >= ops.Curation.BoilMinDf).keySet
    val want = docs.map { case (id, src, t) =>
      val cs = chunksOf(t)
      (id, src, cs.length.toLong, cs.count(boiler).toLong,
        cs.filterNot(boiler).mkString(" "))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.all.find(_.name == "q_boilerplate_strip").get
      .build(spark, sfDir)
      .as[(Long, String, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === want)
    assert(got.exists(_._4 > 0), "fixture must exercise the strip path")
  }

  test("a fully-template document survives as an empty-text row (strip, not dedup)") {
    import spark.implicits._
    val tmpl = (0 until ops.Curation.ChunkLen).map(i => s"tmpl$i").mkString(" ")
    val docs = Seq(
      (1L, "s", tmpl), (2L, "s", tmpl), (3L, "s", tmpl),
      (4L, "s", tmpl + " unique tail words here now ok yes")
    ).toDF("doc_id", "source", "text")
    val out = ops.Curation.boilerplateStripFrom(docs).orderBy("doc_id")
      .as[(Long, String, Long, Long, String)].collect()
    assert(out.length === 4, "no document may vanish — that is dedup's move")
    assert(out.take(3).forall(r => r._4 === 1L && r._5 === ""))
    assert(out(3)._4 === 1L)
    assert(out(3)._5 === "unique tail words here now ok yes")
  }
}
