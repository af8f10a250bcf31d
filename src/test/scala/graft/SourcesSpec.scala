package graft

/** Source-side API surface: catalog existence (R10) and the JDBC source's
  * option plumbing (R1) — the connection itself is untestable offline.
  */
class SourcesSpec extends SparkSpec {

  test("catalog existence check (R10)") {
    spark.range(1).createOrReplaceTempView("r10_probe")
    assert(Tables.exists(spark, "r10_probe"))
    assert(!Tables.exists(spark, "no_such_table_r10"))
    spark.catalog.dropTempView("r10_probe")
  }

  test("malformed JSON rows are quarantined, not dropped or fatal (PERMISSIVE)") {
    // a 100 TB ingest ALWAYS contains malformed rows; the engine's posture
    // is PERMISSIVE with an explicit quarantine column — bad rows are
    // preserved for triage, good rows parse, and the job never dies
    // mid-scan (FAILFAST) or silently loses data (DROPMALFORMED)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "badrec").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "ok"}""",
        """{"id": 2, "v": """,          // truncated — malformed
        """{"id": 3, "v": "also ok"}"""))
    val schema = "id BIGINT, v STRING, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized parse
    try {
      assert(df.count() === 3)
      val good = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      val bad  = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      assert(good.count() === 2 && bad.count() === 1)
      assert(bad.head().getAs[String]("_corrupt_record").contains("\"id\": 2"))
    } finally df.unpersist()
  }

  test("jdbc source plumbing reaches JDBC driver resolution") {
    // no JDBC driver on the classpath: the failure must be driver
    // resolution for OUR url — proving url/dbtable options reached
    // Spark's JDBC source (the only offline-checkable part)
    val e = intercept[Exception] {
      Tables.jdbc(spark, "jdbc:postgresql://localhost:5432/nope", "t",
        Map("user" -> "u", "password" -> "p"))
    }
    val msg = Option(e.getMessage).getOrElse("") + " " +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("driver"), s"unexpected failure: $e")
  }

  test("format matrix: documents round-trip losslessly through CSV, JSON, and ORC") {
    // the R1 source surface beyond parquet: every built-in columnar/text
    // format must carry the documents table bit-identically (schema
    // pinned on read — CSV/JSON would otherwise re-infer and widen)
    val src = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val want = src.orderBy("doc_id").collect().toSeq
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$base/$fmt"
      val w = src.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(path)
      val r = spark.read.schema(src.schema)
      val back = (if (fmt == "csv") r.option("header", "true") else r)
        .format(fmt).load(path)
      assert(back.orderBy("doc_id").collect().toSeq === want,
        s"$fmt round-trip lost data")
    }
  }
}
