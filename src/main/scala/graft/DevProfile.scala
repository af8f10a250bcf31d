package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.exprs._

/** Scratch stage-level profiler for the dedup pipeline (dev tool). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs  = Tables.documents(spark, sfDir)
    val dtoks = array_distinct(split(col("text"), " "))
    val clusters = docs.groupBy(array_sort(dtoks).as("t"))
      .agg(collect_list(col("doc_id")).as("ms"))
      .withColumn("th", array_sort(transform(col("t"), t => poly_hash(t))))
      .withColumn("sig", transform(sequence(lit(0), lit(15)), i =>
        array_min(transform(col("th"), h =>
          (h * (i * 2 + 1) + (i * 101 + 17)) % graft.functions.Hashing.Mod))))
      .withColumn("cid", array_min(col("ms")))
    timed("clusters count")(println(clusters.count()))
    val cached = clusters.cache()
    timed("clusters cache")(cached.count())

    val bandKeys = transform(sequence(lit(0), lit(1)), b =>
      concat_ws(",", transform(slice(col("sig"), b * 8 + 1, lit(8)), x => x.cast("string"))))
    val bandRows = cached.select(col("cid"), posexplode(bandKeys).as(Seq("band", "key")))
    val candClusters = bandRows.join(
      bandRows.select(col("cid").as("cid2"), col("band").as("band2"), col("key").as("key2")),
      col("band") === col("band2") && col("key") === col("key2") && col("cid") < col("cid2"))
      .select("cid", "cid2")
    timed("raw cand cluster pairs")(println(candClusters.count()))
    timed("distinct cand pairs")(println(candClusters.distinct().count()))

    val left  = cached.select(col("cid"), col("th").as("h1"), col("sig").as("sig1"))
    val right = cached.select(col("cid").as("cid2"), col("th").as("h2"), col("sig").as("sig2"))
    val inter = intersect_count_sorted(col("h1"), col("h2"))
    val uni   = size(col("h1")) + size(col("h2")) - inter
    val qp = candClusters.distinct()
      .join(left, "cid").join(right, "cid2")
      .select(col("cid"), col("cid2"), count_equal(col("sig1"), col("sig2")).as("sig_agree"),
        inter.as("inter"), uni.as("uni"), (inter / uni).as("jac"))
      .filter(col("sig_agree") >= 14 && col("jac") >= 0.9)
    timed("qualifying cluster pairs")(println(qp.count()))
    spark.stop()
  }
}
