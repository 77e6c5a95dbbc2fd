package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Spatial operators: the grid-cell distance join — the 2-D member of
  * the bucketed-theta-join family (1-D intervals: q153; time bands:
  * q23). */
object SpatialOps {

  private val CellDeg = 2.0 // cell width == distance threshold

  /** Grid-cell distance self-join: all customer pairs within 2 planar
    * degrees, via the classic cell trick — cell width = the threshold,
    * one side keeps its cell, the other replicates into the 3×3
    * neighborhood, so every qualifying pair shares exactly ONE join
    * cell (offsets are distinct — no dedup stage) and the candidate set
    * is provably a superset (|Δlat| ≤ d ⇒ cell indices differ by ≤ 1).
    * Shuffle volume is O(points·9) on cell keys instead of the
    * nested-loop O(points²); the exact distance check prunes candidates
    * scan-side after the join. Coordinates are deterministic md5-span
    * pseudo-positions (0.1° resolution) so the DuckDB oracle replays
    * them bit-for-bit; the distance is planar euclidean — deliberately
    * not haversine, whose sin/cos are not bit-stable across libm
    * builds (the operator shape is identical). */
  val q295_spatial_grid_join = Q(
    "q295_spatial_grid_join", {
      import graft.functions.TextFunctions.hexSpanValSql
      val lat = s"((${hexSpanValSql("h", 0, 6)} % 1800) / 10.0 - 90)"
      val lon = s"((${hexSpanValSql("h", 6, 6)} % 3600) / 10.0 - 180)"
      Some(s"""WITH p AS (
              |  SELECT c_custkey AS ck, $lat AS lat, $lon AS lon
              |  FROM (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS h
              |        FROM customer)),
              |a AS (
              |  SELECT ck, lat, lon,
              |    CAST(floor(lat / $CellDeg) AS BIGINT) AS cx,
              |    CAST(floor(lon / $CellDeg) AS BIGINT) AS cy
              |  FROM p),
              |b AS (
              |  SELECT ck, lat, lon, cx + dx.v AS cx, cy + dy.v AS cy
              |  FROM a
              |  CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
              |  CROSS JOIN (VALUES (-1), (0), (1)) dy(v))
              |SELECT a.ck AS ck_a, b.ck AS ck_b,
              |  round(sqrt((a.lat - b.lat) * (a.lat - b.lat)
              |           + (a.lon - b.lon) * (a.lon - b.lon)), 6) AS dist
              |FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy AND a.ck < b.ck
              |WHERE (a.lat - b.lat) * (a.lat - b.lat)
              |    + (a.lon - b.lon) * (a.lon - b.lon)
              |    <= $CellDeg * $CellDeg
              |ORDER BY dist, ck_a, ck_b
              |LIMIT 10""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val p = Tables.customer(s, d)
        .withColumn("h", md5(col("c_custkey").cast("string")))
        .select(col("c_custkey").as("ck"),
          ((expr(hexSpanValSql("h", 0, 6)) % 1800) / 10.0 - 90).as("lat"),
          ((expr(hexSpanValSql("h", 6, 6)) % 3600) / 10.0 - 180).as("lon"))
      val a = p
        .withColumn("cx", floor(col("lat") / CellDeg).cast("long"))
        .withColumn("cy", floor(col("lon") / CellDeg).cast("long"))
      val b = a
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("ck").as("bck"), col("lat").as("blat"),
          col("lon").as("blon"), (col("cx") + col("dx")).as("cx"),
          (col("cy") + col("dy")).as("cy"))
      val d2 = (col("lat") - col("blat")) * (col("lat") - col("blat")) +
        (col("lon") - col("blon")) * (col("lon") - col("blon"))
      a.join(b, Seq("cx", "cy"))
        .filter(col("ck") < col("bck") && d2 <= CellDeg * CellDeg)
        .select(col("ck").as("ck_a"), col("bck").as("ck_b"),
          round(sqrt(d2), 6).as("dist"))
        .orderBy(col("dist"), col("ck_a"), col("ck_b"))
        .limit(10)
    })

  val all: Seq[Q] = Seq(q295_spatial_grid_join)
}
