package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** Spatial grid index — the Spark-native analog of the reference's GiST
  * index (`CREATE INDEX ... USING GIST`, sql_to_line.py:238,
  * sql_to_line_v2.py:140; R20, the one
  * reference surface previously documented as a non-goal). A tree index
  * over mutable heap pages has no distributed equivalent; the scalable
  * translation is SPACE PARTITIONING: assign every geometry a fixed-size
  * grid cell key, then
  *
  *  - point/region lookups become a coarse cell-key filter (partition-
  *    prunable when the table is written `partitionBy(cell)` — proven
  *    in-plan by SpatialSpec, the same layout contract as the IVF ANN
  *    index) followed by the exact geometric predicate, and
  *  - spatial joins become equi-joins on the cell key with one side
  *    replicated to its 3×3 cell neighborhood — candidate volume is
  *    Θ(points × 9 × density), never Θ(points²), and the join shuffles
  *    on small integer keys. This is the standard distributed spatial-
  *    join design (grid/partition-based spatial join; cf. SpatialHadoop
  *    / Sedona, both public literature).
  *
  * Cell size 0.05° with radius 0.02° keeps radius ≤ cell so the 3×3
  * neighborhood is sufficient (any neighbor within r lies in an adjacent
  * cell). All predicates are +/×/floor on exact inputs → cross-engine
  * bit-identical, no rounding needed.
  */
object Spatial {

  private val CellDeg = 0.05

  /** Grid cell index of a coordinate (floor division, negative-safe). */
  def cellOf(c: Column): Column = floor(c / lit(CellDeg))

  /** Indexed bbox predicate over endpoint columns: the grid-cell coarse
    * range (partition-prunable on a cell-partitioned layout; superset of
    * the exact box by floor monotonicity) AND the exact bounds. The single
    * source for q_spatial_bbox and the streaming geofence — cell size
    * lives only here.
    */
  def bboxFilter(lonMin: Double, lonMax: Double,
      latMin: Double, latMax: Double): Column = {
    def lo(v: Double) = math.floor(v / CellDeg).toLong
    cellOf(col("endlon")).between(lo(lonMin), lo(lonMax)) &&
      cellOf(col("endlat")).between(lo(latMin), lo(latMax)) &&
      col("endlon").between(lonMin, lonMax) &&
      col("endlat").between(latMin, latMax)
  }

  // bbox: endpoint longitude [-134, -132.5] × latitude [50, 52] — inside
  // the fixture's coordinate domain at every scale factor (small-sf runs
  // only populate the low user-id longitudes). Coarse cell bounds derive
  // from the same floor arithmetic, computed once here and embedded as
  // literals in BOTH engines (monotonicity of floor makes the coarse range
  // a superset of the exact one at any rounding).
  private val LonMin = -134.0; private val LonMax = -132.5
  private val LatMin = 50.0;   private val LatMax = 52.0
  private val CxMin = math.floor(LonMin / CellDeg).toLong
  private val CxMax = math.floor(LonMax / CellDeg).toLong
  private val CyMin = math.floor(LatMin / CellDeg).toLong
  private val CyMax = math.floor(LatMax / CellDeg).toLong

  private val RadiusSq = "0.0004" // (0.02°)²; exact literal in both engines
  private val CellSq   = "0.0025" // (0.05°)² = one cell-width, the kNN radius bound

  val queries: Seq[Q] = Seq(

    // Region (bbox) lookup through the grid index: the coarse cell-range
    // predicate — the one a cell-partitioned layout prunes on — then the
    // exact bounds. ST_Within-over-GiST analog (R20 read path).
    Q("q_spatial_bbox",
      Segments.oracle(
        s"""SELECT segmentid, endlon, endlat
           |FROM (SELECT segmentid, endlon, endlat,
           |             CAST(floor(endlon / $CellDeg) AS BIGINT) AS cx,
           |             CAST(floor(endlat / $CellDeg) AS BIGINT) AS cy
           |      FROM segments)
           |WHERE cx BETWEEN $CxMin AND $CxMax AND cy BETWEEN $CyMin AND $CyMax
           |  AND endlon BETWEEN $LonMin AND $LonMax
           |  AND endlat BETWEEN $LatMin AND $LatMax
           |ORDER BY segmentid""".stripMargin)) { (s, dir) =>
      Segments.df(s, dir)
        .filter(bboxFilter(LonMin, LonMax, LatMin, LatMax))
        .select(col("segmentid"), col("endlon"), col("endlat"))
        .orderBy("segmentid")
    },

    // Distance self-join through the grid index: per segment, how many
    // other segments END within 0.02° (plus the closest squared distance).
    // Left side replicates to its 3×3 neighborhood, right side keys by its
    // own cell — each directed candidate appears exactly once (distinct
    // (dx,dy) land in distinct cells), so no post-join dedup is needed.
    // The ST_DWithin-join-over-GiST analog (R20 join path); SpatialSpec
    // proves it equal to the O(n²) brute force on sf0.001.
    Q("q_spatial_join_grid",
      Segments.oracle(
        s""", pts AS (
           |  SELECT segmentid, endlon AS x, endlat AS y,
           |         CAST(floor(endlon / $CellDeg) AS BIGINT) AS cx,
           |         CAST(floor(endlat / $CellDeg) AS BIGINT) AS cy
           |  FROM segments
           |), cand AS (
           |  SELECT a.segmentid AS a_id,
           |         ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d2
           |  FROM (SELECT p.*, p.cx + dx.dx AS jx, p.cy + dy.dy AS jy
           |        FROM pts p,
           |             (VALUES (-1), (0), (1)) AS dx(dx),
           |             (VALUES (-1), (0), (1)) AS dy(dy)) a
           |  JOIN pts b ON a.jx = b.cx AND a.jy = b.cy
           |  WHERE a.segmentid <> b.segmentid
           |)
           |SELECT a_id AS segmentid, count(*) AS n_neighbors, min(d2) AS min_d2
           |FROM cand WHERE d2 < CAST($RadiusSq AS DOUBLE)
           |GROUP BY a_id ORDER BY segmentid""".stripMargin)) { (s, dir) =>
      neighborCounts(Segments.df(s, dir))
    },

    // Bounded-radius k-nearest-neighbors through the grid: for each probe
    // (every 20th segment — the caller-supplied lookup batch, as in the
    // ANN family), the 3 nearest other endpoints within one cell-width
    // (radius ≤ cell ⇒ the 3×3 neighborhood is exhaustive, so this is
    // EXACT bounded-radius kNN, not approximate). Candidates stay
    // Θ(probes × cell density); the rank is a per-probe window (key =
    // probe id — parallelism grows with the probe batch). ST_DWithin +
    // ORDER BY distance LIMIT k over GiST, the reference-stack idiom.
    Q("q_spatial_knn",
      Segments.oracle(
        s""", pts AS (
           |  SELECT segmentid, endlon AS x, endlat AS y,
           |         CAST(floor(endlon / $CellDeg) AS BIGINT) AS cx,
           |         CAST(floor(endlat / $CellDeg) AS BIGINT) AS cy
           |  FROM segments
           |), cand AS (
           |  SELECT a.segmentid AS probe_id, b.segmentid AS nbr_id,
           |         ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d2
           |  FROM (SELECT p.*, p.cx + dx.dx AS jx, p.cy + dy.dy AS jy
           |        FROM pts p,
           |             (VALUES (-1), (0), (1)) AS dx(dx),
           |             (VALUES (-1), (0), (1)) AS dy(dy)
           |        WHERE p.segmentid % 20 = 0) a
           |  JOIN pts b ON a.jx = b.cx AND a.jy = b.cy
           |  WHERE a.segmentid <> b.segmentid
           |), ranked AS (
           |  SELECT probe_id, nbr_id, d2,
           |         CAST(row_number() OVER (PARTITION BY probe_id
           |           ORDER BY d2, nbr_id) AS INTEGER) AS rn
           |  FROM cand WHERE d2 < CAST($CellSq AS DOUBLE)
           |)
           |SELECT probe_id, nbr_id, d2, rn FROM ranked
           |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin)) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(col("d2"), col("nbr_id"))
      candidatePairs(Segments.df(s, dir), col("segmentid") % 20 === 0)
        .filter(col("d2") < expr(s"CAST($CellSq AS DOUBLE)"))
        .select(col("a_id").as("probe_id"), col("b_id").as("nbr_id"), col("d2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("probe_id", "rn")
    }
  )

  /** The shared grid-join kernel: directed candidate pairs (a → b, a ≠ b)
    * within the 3×3 cell neighborhood of each probe, with squared distance.
    * `probe` filters the replicated side BEFORE replication; each directed
    * pair appears exactly once (distinct (dx,dy) land in distinct cells).
    * Single-sourced so the distance join and the kNN cannot drift on the
    * grid contract (cell size, neighborhood width, self-exclusion).
    */
  private def candidatePairs(segments: DataFrame, probe: Column): DataFrame = {
    val pts = segments.select(col("segmentid"), col("endlon").as("x"),
      col("endlat").as("y"), cellOf(col("endlon")).as("cx"),
      cellOf(col("endlat")).as("cy"))
    val offsets = array(lit(-1L), lit(0L), lit(1L))
    val a = pts.filter(probe)
      .withColumn("dx", explode(offsets))
      .withColumn("dy", explode(offsets))
      .select(col("segmentid").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val b = pts.select(col("segmentid").as("b_id"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    a.join(b, Seq("cx", "cy"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("d2", d2)
      .select("a_id", "b_id", "d2")
  }

  /** Core of q_spatial_join_grid over an explicit segments frame (tests /
    * scale probes drive it on synthetic frames).
    */
  private[graft] def neighborCounts(segments: DataFrame): DataFrame =
    candidatePairs(segments, lit(true))
      .filter(col("d2") < expr(s"CAST($RadiusSq AS DOUBLE)"))
      .groupBy(col("a_id").as("segmentid"))
      .agg(count(lit(1)).as("n_neighbors"), min("d2").as("min_d2"))
      .orderBy("segmentid")
}
