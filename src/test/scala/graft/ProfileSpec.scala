package graft

import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile: key columns are unique, stats are internally consistent") {
    import spark.implicits._
    val rows = ops.Profile.queries.find(_.name == "q_profile_columns").get
      .build(spark, sfDir).collect()
    assert(rows.length === 11)
    val byCol = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCol(("customer", "c_custkey")).getBoolean(7))
    assert(byCol(("orders", "o_orderkey")).getBoolean(7))
    rows.foreach { r =>
      val (n, nNull, nDistinct) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nNull >= 0 && nNull <= n)
      assert(nDistinct <= n - nNull, s"distinct > non-null in $r")
      assert(r.getString(5) <= r.getString(6) || r.getString(5).length
        != r.getString(6).length, s"min > max (same width) in $r")
    }
  }

  test("constraint report exercises BOTH statuses on the fixture") {
    val rows = ops.Profile.queries.find(_.name == "q_constraint_report").get
      .build(spark, sfDir).collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getLong(3))).toMap
    // the demonstration check fails by design (orders span several years)
    val (st, v) = rows("o_orderdate_within_1995")
    assert(st === "fail" && v > 0)
    // the integrity checks hold
    Seq("c_custkey_not_null", "c_custkey_unique", "o_orderkey_unique",
      "o_custkey_fk_customer", "l_quantity_range_1_50").foreach { c =>
      assert(rows(c) === ("pass", 0L), s"$c expected clean")
    }
  }
}
