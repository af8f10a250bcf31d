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
}
