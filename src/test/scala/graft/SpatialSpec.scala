package graft

import org.apache.spark.sql.functions._

/** Grid spatial index (R20 GiST analog): the 3×3-replicated grid join must
  * equal brute force (no boundary pair missed), the coarse cell filter must
  * drop nothing the exact bbox keeps, and the cell-partitioned layout must
  * prune partitions in-plan — the same layout contract the IVF ANN index is
  * held to.
  */
class SpatialSpec extends SparkSpec {

  test("grid neighbor join equals the O(n²) brute force on sf0.001") {
    val seg = ops.Segments.df(spark, sfDir)
    val grid = ops.Spatial.neighborCounts(seg)
    val pts = seg.select(col("segmentid"), col("endlon").as("x"), col("endlat").as("y"))
    val a = pts.select(col("segmentid").as("a_id"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("segmentid").as("b_id"), col("x").as("bx"), col("y").as("by"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") =!= col("b_id")).withColumn("d2", d2)
      .filter(col("d2") < 0.0004)
      .groupBy(col("a_id").as("segmentid"))
      .agg(count(lit(1)).as("n_neighbors"), min("d2").as("min_d2"))
    assert(grid.count() > 0, "fixture should contain near pairs")
    assert(grid.except(brute).count() === 0 && brute.except(grid).count() === 0,
      "grid join must equal brute force exactly")
  }

  test("grid kNN equals the O(n²) brute force on sf0.001") {
    val knn = SparkEntry.queries("q_spatial_knn")(spark, sfDir)
    val pts = ops.Segments.df(spark, sfDir)
      .select(col("segmentid"), col("endlon").as("x"), col("endlat").as("y"))
    val a = pts.filter(col("segmentid") % 20 === 0)
      .select(col("segmentid").as("probe_id"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("segmentid").as("nbr_id"), col("x").as("bx"),
      col("y").as("by"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("d2"), col("nbr_id"))
    val brute = a.crossJoin(b)
      .filter(col("probe_id") =!= col("nbr_id")).withColumn("d2", d2)
      .filter(col("d2") < 0.0025)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("probe_id"), col("nbr_id"), col("d2"), col("rn"))
    assert(knn.count() > 0, "fixture should yield kNN hits")
    assert(knn.except(brute).count() === 0 && brute.except(knn).count() === 0,
      "grid kNN must equal brute force exactly (radius ≤ cell ⇒ 3×3 exhaustive)")
  }

  test("hot-cell skew (port scenario): AQE splits the cell join; result equals brute force") {
    // real AIS data concentrates in ports: put HALF of all points inside
    // ONE 0.05° grid cell and the cell equi-join's hot key dwarfs every
    // other partition. Under production-shaped thresholds AQE's
    // OptimizeSkewedJoin must split that partition at runtime (skew=true
    // in the final adaptive plan) AND the split must not change the answer.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold"                        -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                         -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"           -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"             -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled"               -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 1,500 points on a 39×39 lattice inside the cell [50.0,50.05)×[10.0,10.05)
      val hot = (0 until 1500).map(i =>
        (i.toLong, 50.0005 + (i % 39) * 0.00125, 10.0005 + ((i / 39) % 39) * 0.00125))
      // 1,500 points spread one per ~6 cells — no two within the radius
      val cold = (0 until 1500).map(i =>
        (1500L + i, (i % 50) * 0.3 + 0.001, (i / 50) * 0.3 + 0.001))
      val seg = (hot ++ cold).toDF("segmentid", "endlon", "endlat")
      val grid = ops.Spatial.neighborCounts(seg)
      assert(grid.collect().length > 0)
      val finalPlan = grid.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the hot-cell partitions:\n${finalPlan.take(2500)}")
      // the split run must equal brute force exactly — same contract as the
      // uniform-density test above
      val pts = seg.select(col("segmentid"), col("endlon").as("x"), col("endlat").as("y"))
      val a = pts.select(col("segmentid").as("a_id"), col("x").as("ax"), col("y").as("ay"))
      val b = pts.select(col("segmentid").as("b_id"), col("x").as("bx"), col("y").as("by"))
      val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by"))
      val brute = a.crossJoin(b)
        .filter(col("a_id") =!= col("b_id")).withColumn("d2", d2)
        .filter(col("d2") < 0.0004)
        .groupBy(col("a_id").as("segmentid"))
        .agg(count(lit(1)).as("n_neighbors"), min("d2").as("min_d2"))
      assert(grid.except(brute).count() === 0 && brute.except(grid).count() === 0,
        "skew-split grid join must equal brute force exactly")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("coarse cell filter is a strict superset of the exact bbox") {
    // removing the cell predicate must not change the result
    val indexed = SparkEntry.queries("q_spatial_bbox")(spark, sfDir)
    val naive = ops.Segments.df(spark, sfDir)
      .filter(col("endlon").between(-134.0, -132.5) &&
        col("endlat").between(50.0, 52.0))
      .select(col("segmentid"), col("endlon"), col("endlat"))
    assert(indexed.count() > 0)
    assert(indexed.select("segmentid").except(naive.select("segmentid")).count() === 0)
    assert(naive.select("segmentid").except(indexed.select("segmentid")).count() === 0)
  }

  test("cell-partitioned layout prunes partitions for a bbox read") {
    val dir = java.nio.file.Files.createTempDirectory("spatial_cells").toString
    ops.Segments.df(spark, sfDir)
      .select(col("segmentid"), col("endlon"), col("endlat"),
        ops.Spatial.cellOf(col("endlon")).as("cx"))
      .write.mode("overwrite").partitionBy("cx").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("cx").between(-2680L, -2650L))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cx".r.findFirstIn(plan).nonEmpty,
      s"bbox cell filter did not reach partition pruning:\n${plan.take(1200)}")
    val total = ops.Segments.df(spark, sfDir).count()
    assert(read.count() < total, "pruned read should skip out-of-range cells")
    // parity with the in-memory coarse filter
    val inMem = ops.Segments.df(spark, sfDir)
      .select(col("segmentid"), ops.Spatial.cellOf(col("endlon")).as("cx"))
      .filter(col("cx").between(-2680L, -2650L))
    assert(read.select("segmentid").except(inMem.select("segmentid")).count() === 0)
    assert(inMem.select("segmentid").except(read.select("segmentid")).count() === 0)
  }
}
