package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order key: the Column form must equal the portable-SQL form bit for
  * bit, and the layout must deliver its reason to exist — a 2-D box
  * predicate over z-clustered data touches far fewer files/bins than over
  * single-column-ordered data. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue column expression matches the portable SQL form") {
    val df = spark.range(5000).select(
      (col("id") * 2654435761L % 1024).as("x"),
      (col("id") * 40503L % 1024).as("y"))
    val bad = df.select(
      Layout.zValue(col("x"), col("y"), 10).as("a"),
      expr(Layout.zValueSql("x", "y", 10)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("zValue interleaves bits (known values)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8)).as[Long].collect().toSeq
    // interleave(3=0b011, 5=0b101) = y2x2 y1x1 y0x0 = 1,0 0,1 1,1 = 0b100111
    assert(got == Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("a box query touches far fewer z-ordered bins than id-ordered bins") {
    // 64k points on a 256×256 grid, 64 equal-count "files" per layout.
    // The box predicate is 1/16 of each axis — z-clustering bounds both
    // axes per file, id-ordering bounds neither.
    val n = 65536
    val pts = spark.range(n).select(
      col("id"),
      (col("id") * 2654435761L % 256).as("x"),
      (col("id") * 40503L % 256).as("y"))
    val z = pts.withColumn("z", Layout.zValue(col("x"), col("y"), 8))
    val bins = 64
    def binsTouched(ordered: org.apache.spark.sql.DataFrame, orderCol: String): Long = {
      // equal-count binning by rank — a deterministic stand-in for
      // repartitionByRange + one file per partition
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol), col("id"))
      ordered.withColumn("bin", ((row_number().over(w) - 1) / (n / bins)).cast("long"))
        .filter(col("x") < 16 && col("y") < 16)
        .select("bin").distinct().count()
    }
    val zTouched = binsTouched(z, "z")
    val idTouched = binsTouched(z, "id")
    // the box holds ~n/256 points; id-order scatters them over nearly all
    // 64 bins, z-order concentrates them into a handful
    assert(zTouched * 4 <= idTouched,
      s"z-order touched $zTouched bins, id-order $idTouched")
  }

  test("hilbert index is a bijection with unit-step grid adjacency (bits=4)") {
    // all 256 cells of the 16x16 grid: d must be a permutation of
    // 0..255 and consecutive d's must be Manhattan-distance-1 neighbors
    // -- the locality property Z-order lacks (and the reason q390 exists)
    val pts = spark.range(256).select(
      (col("id") % 16).as("x"), expr("id div 16").as("y"))
    val got = pts.select(col("x"), col("y"),
        graft.operators.HilbertLayout.hilbertValue(col("x"), col("y"), 4)
          .as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 256L),
      "hilbert keys must be a bijection onto 0..255")
    got.sliding(2).foreach { case Array((_, (x1, y1)), (d2, (x2, y2))) =>
      val manhattan = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(manhattan == 1, s"step to d=$d2 jumped $manhattan cells")
    }
  }

  test("hilbert column expression matches the oracle CTE walk (bits=8)") {
    val pts = spark.range(4096).select(
      (col("id") * 2654435761L % 256).as("x"),
      (col("id") * 40503L % 256).as("y"))
    pts.createOrReplaceTempView("hilb_src")
    val (ctes, last) = graft.operators.HilbertLayout.hilbertCtesSql("hilb_src", 8)
    // replay the DuckDB CTE chain in Spark SQL: // -> div is the only
    // dialect difference, and EXCLUDE -> EXCEPT
    val sparkSql = s"WITH $ctes SELECT x, y, hd FROM $last"
      .replace("//", "div").replace("EXCLUDE", "EXCEPT")
    val viaCte = spark.sql(sparkSql)
    val bad = pts.select(col("x"), col("y"),
        graft.operators.HilbertLayout.hilbertValue(col("x"), col("y"), 8)
          .as("de"))
      .join(viaCte, Seq("x", "y"))
      .filter(col("de") =!= col("hd")).count()
    assert(bad == 0)
  }
}
