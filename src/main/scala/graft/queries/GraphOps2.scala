package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 graph additions: structural-equivalence similarity
  * (SimRank) and null-model significance for triangle counts.
  */
object GraphOps2 {

  private val SrC = 0.8
  private val SrBuckets = 20
  private val SrTopK = 15

  /** Bipartite SimRank (Jeh–Widom 2002) between part buckets through
    * the supplier side: "two parts are similar if their suppliers are
    * similar; two suppliers are similar if their parts are similar" —
    * structural equivalence where q199's Adamic-Adar only counts
    * direct co-neighbors. Two alternations: sS₁ from the δ-init part
    * side, then sP₂ from sS₁, each s(a,b) = C/(d_a·d_b)·Σ over
    * neighbor pairs. Determinism: inner sums ride round(·,12) →
    * DECIMAL(28,12) (the q117 discipline) because they add up to
    * d_a·d_b doubles whose agg order differs per engine; the
    * C/(d·d) factors are exact-int divisions applied once.
    *
    * Scale shape: ONE corpus distinct-agg to the ≤400-edge bipartite
    * bucket graph; every SimRank join is grid×grid (edges² ≤ 160k
    * tuples). Top-15 off-diagonal part pairs. */
  val q413_simrank = Q(
    "q413_simrank",
    Some(s"""WITH e AS (
            |  SELECT DISTINCT l_partkey % $SrBuckets AS p,
            |    l_suppkey % $SrBuckets AS s
            |  FROM lineitem),
            |dp AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY p),
            |ds AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY s),
            |ss1 AS (
            |  SELECT a.s AS s1, b.s AS s2,
            |    CASE WHEN a.s = b.s THEN CAST(1 AS DOUBLE)
            |      ELSE $SrC * cnt / (a.d * b.d) END AS sim
            |  FROM (
            |    SELECT x.s AS sa, y.s AS sb,
            |      CAST(count(*) AS DOUBLE) AS cnt
            |    FROM e x JOIN e y ON x.p = y.p
            |    GROUP BY x.s, y.s) c
            |  JOIN ds a ON a.s = c.sa JOIN ds b ON b.s = c.sb),
            |sp2 AS (
            |  SELECT ep.p AS p1, eq.p AS p2,
            |    CAST(sum(CAST(round(s.sim, 12) AS DECIMAL(28,12)))
            |      AS DOUBLE) AS acc
            |  FROM e ep JOIN ss1 s ON s.s1 = ep.s
            |  JOIN e eq ON eq.s = s.s2
            |  GROUP BY ep.p, eq.p)
            |SELECT p1, p2,
            |  round($SrC * sp2.acc / (d1.d * d2.d), 6) AS simrank
            |FROM sp2
            |JOIN dp d1 ON d1.p = sp2.p1
            |JOIN dp d2 ON d2.p = sp2.p2
            |WHERE p1 < p2
            |ORDER BY simrank DESC, p1, p2
            |LIMIT $SrTopK""".stripMargin),
    (s, d) => {
      val e = graft.operators.PlanCache.persist(
        Tables.lineitem(s, d)
          .select((col("l_partkey") % SrBuckets).as("p"),
            (col("l_suppkey") % SrBuckets).as("s"))
          .distinct())
      val dp = e.groupBy("p").agg(count(lit(1)).as("d"))
      val ds = graft.operators.PlanCache.persist(
        e.groupBy("s").agg(count(lit(1)).as("d")))
      val coS = e.toDF("p", "sa").join(e.toDF("p", "sb"), "p")
        .groupBy("sa", "sb").agg(count(lit(1)).cast("double").as("cnt"))
      val ss1 = coS
        .join(ds.toDF("sa", "da"), "sa")
        .join(ds.toDF("sb", "db"), "sb")
        .select(col("sa").as("s1"), col("sb").as("s2"),
          when(col("s1") === col("s2"), lit(1.0))
            .otherwise(lit(SrC) * col("cnt") / (col("da") * col("db")))
            .as("sim"))
      val sp2 = e.toDF("p1", "s1").join(ss1, "s1")
        .join(e.toDF("p2", "s2"), "s2")
        .groupBy("p1", "p2")
        .agg(sum(round(col("sim"), 12).cast("decimal(28,12)"))
          .cast("double").as("acc"))
      sp2.join(dp.toDF("p1", "d1"), "p1")
        .join(dp.toDF("p2", "d2"), "p2")
        .filter(col("p1") < col("p2"))
        .select(col("p1"), col("p2"),
          round(lit(SrC) * col("acc") / (col("d1") * col("d2")), 6)
            .as("simrank"))
        .orderBy(col("simrank").desc, col("p1"), col("p2"))
        .limit(SrTopK)
    })

  private val NmBuckets = 40

  /** Triangle significance against the configuration-model null: is
    * the co-purchase graph's clustering REAL structure or just what
    * its degree sequence forces? Observed triangles by the q133
    * rank-orientation wedge join; expected clustering under the
    * configuration model from degree moments alone —
    * C_config = (⟨k²⟩−⟨k⟩)² / (n·⟨k⟩³) — so the null needs NO
    * simulation, only the exact degree sums of one pass. Reports
    * observed triangles, wedges, observed global clustering
    * 3T/wedges, the null clustering, and the lift. On THIS graph the
    * test is a negative control, and that is the point: modulus
    * bucketing scrambles any real co-purchase structure, the bucket
    * graph saturates toward completeness, and the test correctly
    * answers lift ≈ 1 ("nothing beyond the degree sequence") — the
    * reading that stops an analyst from narrating clustering that
    * isn't there. */
  val q414_null_model_triangles = Q(
    "q414_null_model_triangles",
    Some(s"""WITH li AS (
            |  SELECT DISTINCT l_orderkey AS ok, l_partkey % $NmBuckets AS node
            |  FROM lineitem),
            |e AS (
            |  SELECT DISTINCT x.node AS a, y.node AS b
            |  FROM li x JOIN li y ON x.ok = y.ok AND x.node < y.node),
            |deg AS (
            |  SELECT node, CAST(count(*) AS BIGINT) AS deg
            |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) t
            |  GROUP BY node),
            |o AS (
            |  SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
            |         CASE WHEN ra < rb THEN b ELSE a END AS v,
            |         CASE WHEN ra < rb THEN rb ELSE ra END AS rv
            |  FROM (SELECT e.a, e.b, da.deg * 100000 + e.a AS ra,
            |               db.deg * 100000 + e.b AS rb
            |        FROM e JOIN deg da ON da.node = e.a
            |        JOIN deg db ON db.node = e.b) t),
            |tri AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_tri
            |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.rv < o2.rv
            |  JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(deg) AS BIGINT) AS sd,
            |    CAST(sum(deg * deg) AS BIGINT) AS sd2,
            |    CAST(sum(deg * (deg - 1)) AS BIGINT) AS wedges2
            |  FROM deg)
            |SELECT tri.n_tri,
            |  m.wedges2 // 2 AS n_wedges,
            |  round(3.0 * tri.n_tri / (m.wedges2 // 2), 6) AS clustering_obs,
            |  round((CAST(m.sd2 AS DOUBLE) / m.n - CAST(m.sd AS DOUBLE) / m.n)
            |    * (CAST(m.sd2 AS DOUBLE) / m.n - CAST(m.sd AS DOUBLE) / m.n)
            |    / (m.n * (CAST(m.sd AS DOUBLE) / m.n)
            |      * (CAST(m.sd AS DOUBLE) / m.n)
            |      * (CAST(m.sd AS DOUBLE) / m.n)), 6) AS clustering_null,
            |  round((3.0 * tri.n_tri / (m.wedges2 // 2))
            |    / ((CAST(m.sd2 AS DOUBLE) / m.n - CAST(m.sd AS DOUBLE) / m.n)
            |    * (CAST(m.sd2 AS DOUBLE) / m.n - CAST(m.sd AS DOUBLE) / m.n)
            |    / (m.n * (CAST(m.sd AS DOUBLE) / m.n)
            |      * (CAST(m.sd AS DOUBLE) / m.n)
            |      * (CAST(m.sd AS DOUBLE) / m.n))), 4) AS lift
            |FROM tri CROSS JOIN m""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % NmBuckets).as("node"))
        .distinct()
      val e = graft.operators.PlanCache.persist(
        li.toDF("ok", "a").join(li.toDF("ok", "b"), "ok")
          .filter(col("a") < col("b"))
          .select("a", "b").distinct())
      val deg = graft.operators.PlanCache.persist(
        e.select(col("a").as("node"))
          .union(e.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg")))
      val ranked = e
        .join(deg.toDF("a", "da"), "a")
        .join(deg.toDF("b", "db"), "b")
        .select(col("a"), col("b"),
          (col("da") * 100000 + col("a")).as("ra"),
          (col("db") * 100000 + col("b")).as("rb"))
      val o = graft.operators.PlanCache.persist(ranked.select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"),
        greatest(col("ra"), col("rb")).as("rv")))
      val tri = o.toDF("u", "v", "rv")
        .join(o.toDF("u", "w", "rw"), "u")
        .filter(col("rv") < col("rw"))
        .join(o.toDF("v", "w", "r3"), Seq("v", "w"))
        .agg(count(lit(1)).as("n_tri"))
      val m = deg.agg(count(lit(1)).as("n"),
        sum("deg").cast("long").as("sd"),
        sum(col("deg") * col("deg")).cast("long").as("sd2"),
        sum(col("deg") * (col("deg") - 1)).cast("long").as("wedges2"))
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      broadcast(tri).crossJoin(broadcast(m))
        .select(col("n_tri"),
          expr("wedges2 div 2").as("n_wedges"),
          round(lit(3.0) * col("n_tri") / expr("wedges2 div 2"), 6)
            .as("clustering_obs"),
          round((dd(col("sd2")) / col("n") - dd(col("sd")) / col("n"))
            * (dd(col("sd2")) / col("n") - dd(col("sd")) / col("n"))
            / (col("n") * (dd(col("sd")) / col("n"))
              * (dd(col("sd")) / col("n")) * (dd(col("sd")) / col("n"))), 6)
            .as("clustering_null"),
          round((lit(3.0) * col("n_tri") / expr("wedges2 div 2"))
            / ((dd(col("sd2")) / col("n") - dd(col("sd")) / col("n"))
              * (dd(col("sd2")) / col("n") - dd(col("sd")) / col("n"))
              / (col("n") * (dd(col("sd")) / col("n"))
                * (dd(col("sd")) / col("n")) * (dd(col("sd")) / col("n")))),
            4).as("lift"))
    })

  val all: Seq[Q] = Seq(q413_simrank, q414_null_model_triangles)
}
