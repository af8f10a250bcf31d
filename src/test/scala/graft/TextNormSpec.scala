package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextNorm

/** Gates for the Unicode canonicalization kernel. The fixture corpus is
  * pure ASCII, so the REAL non-ASCII behavior is pinned here against
  * values computed in DuckDB 1.0 this session
  * (`trim(regexp_replace(lower(nfc_normalize($1)), '[ \t\n\r]+', ' ', 'g'), ' ')`)
  * — the exact oracle chain q_text_normalize runs.
  */
class TextNormSpec extends SparkSpec {

  private def n(s: String): String =
    TextNorm.normalize(UTF8String.fromString(s)).toString

  test("NFC composition: decomposed and singleton forms collapse") {
    // e + U+0301 -> é; A + U+030A -> å; o + U+0308 -> ö; U+212B -> å
    assert(n("Café") === "café")
    assert(n("café") === "café")
    assert(n("Ångström") === "ångström")
    assert(n("Ångström") === "ångström")
  }

  test("simple-map lowercase: the DuckDB utf8proc parity pins") {
    // U+0130 maps to plain i (simple map) — NOT "i" + combining dot
    // (String.toLowerCase's full map), which DuckDB would hash-mismatch
    assert(n("İstanbul") === "istanbul")
    assert(n("İstanbul").length === 8)
    // capital sigma maps to σ in EVERY position — no contextual final ς
    assert(n("ΣΑΣ Σ") === "σασ σ")
    // sharp s is lower already: lower(), not case-FOLDING (no ß -> ss)
    assert(n("STRAßE") === "straße")
    // supplementary-plane codepoints pass through by codepoint
    assert(n(new String(Character.toChars(0x1F600)) + " X")
      === new String(Character.toChars(0x1F600)) + " x")
  }

  test("whitespace: collapse + trim over exactly { space, tab, LF, CR }") {
    assert(n("  a \t\r\n bc  ") === "a bc")
    assert(n(" \t ") === "")
    assert(n("") === "")
    // U+000B is OUTSIDE the class by contract (Java \s and RE2 \s
    // disagree on it; the kernel pins the explicit 4-char class)
    assert(n("ab") === "ab")
  }

  test("generative property: idempotent, and invariant to the input's normalization form") {
    // deterministic LCG over a pool of tricky codepoints (accents,
    // combining marks, singletons, Greek/Cyrillic, ws, supplementary) —
    // for every generated string: normalize is idempotent, and feeding
    // the NFD/NFC re-normalizations of the SAME string yields the same
    // canonical output (the property that makes fingerprints stable
    // across upstream encoders)
    val pool: Array[String] = Array("a", "B", "é", "É", "é",
      "Å", "Å", "Å", "ö", "ö", "ß", "Σ", "σ", "И", "и",
      " ", "\t", "\n", "\r", "ﬁ", new String(Character.toChars(0x1F600)),
      "ñ", "Ñ", "ç", "Ç")
    var seed = 123456789L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    (1 to 200).foreach { _ =>
      val s = (1 to (1 + nextInt(24))).map(_ => pool(nextInt(pool.length)))
        .mkString
      val out = n(s)
      assert(n(out) === out, s"not idempotent on ${s.getBytes("UTF-8").toSeq}")
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(n(nfd) === out && n(nfc) === out,
        s"form-sensitive on ${s.getBytes("UTF-8").toSeq}")
    }
  }

  test("idempotence over the declared fixture raws") {
    import spark.implicits._
    val out = graft.ops.TextOps.queries.find(_.name == "q_text_normalize").get
      .build(spark, sfDir)
      .select("raw", "norm_text").as[(String, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (raw, norm) =>
      assert(n(raw) === norm)
      assert(n(norm) === norm, s"not idempotent on: $norm")
    }
  }

  test("canonicalize-before-dedup: the PRODUCTION planes catch a non-ASCII " +
      "near-dup pair the raw pipeline misses") {
    import spark.implicits._
    import graft.functions.exprs.poly_hash
    import graft.functions.TextNormExprs.normalize_text
    // same canonical document, two raw encodings: composed é + mixed
    // case vs combining-mark e+́ + tab/newline/run-of-space noise;
    // doc 3 is unrelated. Raw token sets share only the tokens that
    // happen to agree in case ("du"/"jour"-class) — Jaccard far below
    // the 0.9 qualifying bar — while canonical token sets are IDENTICAL.
    val docs = Seq(
      (1L, "Caf\u00E9 du jour MARKET Report Alpha beta GAMMA delta EPSILON zeta ETA"),
      (2L, "  CAFE\u0301\tDU jour market report alpha BETA gamma DELTA epsilon ZETA eta\n"),
      (3L, "totally different content words one two three four five six seven eight")
    ).toDF("doc_id", "text")

    // exact-dup plane (q_doc_fingerprint's contract): canonical PolyHash
    // collapses the pair, raw PolyHash never does
    val fps = docs.select(col("doc_id"), poly_hash(col("text")).as("raw_fp"),
        poly_hash(normalize_text(col("text"))).as("norm_fp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L)._2 === fps(2L)._2, "canonical fingerprints must collide")
    assert(fps(1L)._1 !== fps(2L)._1, "raw fingerprints must not collide")
    assert(fps(3L)._2 !== fps(1L)._2)

    // MinHash/cluster plane: clusterFrameOf (which now tokenizes the
    // canonical text) puts the pair in ONE token-set cluster…
    val clusters = ops.Dedup.clusterFrameOf(docs)
      .select("ms").as[Seq[Long]].collect().map(_.toSet)
    assert(clusters.contains(Set(1L, 2L)),
      s"normalized cluster frame missed the pair: ${clusters.toSeq}")
    // …while the raw-token grouping (the pre-round-11 pipeline) leaves
    // three singletons
    val rawClusters = docs
      .select(col("doc_id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => poly_hash(t))).as("th"))
      .groupBy("th").agg(collect_list("doc_id").as("ms"))
      .select("ms").as[Seq[Long]].collect().map(_.toSet)
    assert(rawClusters.forall(_.size === 1),
      s"raw pipeline should not find the pair: ${rawClusters.toSeq}")

    // SimHash plane: the banded 30-bit engine finds the pair at Hamming 0
    val simPairs = ops.Dedup.simhashPairsFrom(docs)
      .select("d1", "d2", "ham").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toInt))
    assert(simPairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      s"simhash plane missed the canonical pair: ${simPairs.toSeq}")

    // char-3-gram plane (q_ngram_jaccard's kernel, canonicalized in
    // round 12): the canonical shingle sets are identical (jac = 1.0)
    // where the raw sets disagree on every cased/accented trigram
    val sh = docs.withColumn("nt", normalize_text(col("text")))
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), " +
          "i -> substr(text, i, 3)))").as("rs"),
        expr("array_distinct(transform(sequence(1, greatest(length(nt) - 2, 1)), " +
          "i -> substr(nt, i, 3)))").as("ns"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[String](1).toSet, r.getSeq[String](2).toSet)).toMap
    assert(sh(1L)._2 === sh(2L)._2, "canonical shingle sets must match")
    assert(sh(1L)._1 !== sh(2L)._1, "raw shingle sets should differ")
  }

  test("(even, odd) raw variants normalize equal; distinct pairs differ") {
    import spark.implicits._
    val rows = graft.ops.TextOps.queries.find(_.name == "q_text_normalize").get
      .build(spark, sfDir)
      .select("doc_id", "norm_text").as[(Long, String)].collect().toMap
    val pairs = rows.keys.filter(id => id % 2 == 0 && rows.contains(id + 1))
    assert(pairs.nonEmpty)
    pairs.foreach(id => assert(rows(id) === rows(id + 1)))
    val canon = pairs.map(rows).toSeq
    assert(canon.distinct.size === canon.size, "cross-pair collision")
  }
}
