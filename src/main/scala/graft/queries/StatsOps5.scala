package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec
import graft.functions.TextFunctions.hexSpanValSql

/** Round-9 statistics additions, part 4: deterministic re-randomization
  * (permutation) testing, feature↔label mutual information, and
  * group-sequential monitoring with O'Brien–Fleming boundaries.
  */
object StatsOps5 {

  private val Perms = 16 // re-randomizations beyond the observed split

  /** Re-randomization (permutation) test on per-user spend between the
    * md5 arms — the nonparametric p-value machine behind q254/q270 when
    * normality is in doubt. DETERMINISTIC permutations: re-assignment b
    * uses bit b of each user's md5 (bit 0 = the observed arm), so both
    * engines enumerate the identical 16 re-randomizations; p = (1 +
    * #{b≥1 : |Δ_b| ≥ |Δ_obs|}) / 17 (the add-one Monte-Carlo
    * convention). One user-keyed agg, then a users×17 flat-map grouped
    * per permutation — exact cent sums per group, doubles only in the
    * 17-row grid. */
  val q318_permutation_test = Q(
    "q318_permutation_test",
    Some(s"""WITH u AS (
            |  SELECT user_id,
            |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            |      AS y,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)}
            |      AS hv
            |  FROM events GROUP BY user_id),
            |px AS (
            |  SELECT u.y,
            |    g.perm,
            |    (hv // CAST(pow(2, g.perm) AS BIGINT)) % 2 AS arm
            |  FROM u CROSS JOIN (
            |    SELECT unnest(generate_series(0, $Perms)) AS perm) g),
            |grid AS (
            |  SELECT perm,
            |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
            |      AS n1,
            |    CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CASE WHEN arm = 1
            |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE) AS s1,
            |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s
            |  FROM px GROUP BY perm),
            |diffs AS (
            |  SELECT perm,
            |    round((s1 / n1 - (s - s1) / (n - n1)) / 100, 6) AS diff
            |  FROM grid),
            |obs AS (SELECT diff AS obs_diff FROM diffs WHERE perm = 0)
            |SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
            |  obs_diff,
            |  (SELECT CAST(sum(CASE WHEN abs(diff) >= abs(obs_diff)
            |     THEN 1 ELSE 0 END) AS BIGINT)
            |   FROM diffs WHERE perm >= 1) AS n_ge,
            |  round((1 + (SELECT sum(CASE WHEN abs(diff) >= abs(obs_diff)
            |     THEN 1 ELSE 0 END) FROM diffs WHERE perm >= 1))
            |    / CAST(${Perms + 1} AS DOUBLE), 6) AS p_value
            |FROM obs""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(dec(col("value"))) * 100).cast("long").as("y"))
        .withColumn("h", md5(col("user_id").cast("string")))
        .select(col("y"), expr(hexSpanValSql("h", 0, 8)).as("hv"))
      val px = u.select(col("y"), col("hv"),
          explode(sequence(lit(0), lit(Perms))).as("perm"))
        .select(col("y"), col("perm"),
          expr("(hv div CAST(pow(2, perm) AS BIGINT)) % 2").as("arm"))
      val grid = px.groupBy("perm").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        count(lit(1)).as("n"),
        sum(when(col("arm") === 1, col("y").cast("decimal(38,0)")))
          .cast("double").as("s1"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("s"))
      val diffs = graft.operators.PlanCache.persist(grid.select(col("perm"),
        round((col("s1") / col("n1") -
          (col("s") - col("s1")) / (col("n") - col("n1"))) / 100, 6)
          .as("diff")))
      val obs = diffs.filter(col("perm") === 0)
        .select(col("diff").as("obs_diff"))
      val nUsers = u.agg(count(lit(1)).as("n_users"))
      val nge = diffs.filter(col("perm") >= 1).crossJoin(broadcast(obs))
        .agg(sum(when(abs(col("diff")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)).as("n_ge"))
      broadcast(nUsers).crossJoin(broadcast(obs)).crossJoin(nge)
        .select(col("n_users"), col("obs_diff"), col("n_ge"),
          round((lit(1) + col("n_ge")) / lit((Perms + 1).toDouble), 6)
            .as("p_value"))
    })

  /** Mutual information between event type and spend bin — the
    * feature-selection readout ("how much does knowing the type tell you
    * about spend"): I(X;Y), H(X), H(Y) and the normalized
    * MI/min(H(X),H(Y)) from the 5×8 contingency grid (value binned at
    * 125-wide buckets capped at 8 — fixed, engine-identical bins). All
    * counts exact from ONE corpus agg; per-cell p·ln terms round at 9
    * and decimal-sum so the entropy folds are partial-agg-order
    * independent. Nats, not bits (ln on both engines). */
  val q320_mi_feature = Q(
    "q320_mi_feature",
    Some("""WITH g AS (
           |  SELECT event_type AS x,
           |    LEAST(CAST(FLOOR(value / 125) AS BIGINT), 7) AS y,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
           |px AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM g GROUP BY x),
           |py AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM g GROUP BY y),
           |mi AS (
           |  SELECT CAST(sum(CAST(round((CAST(c AS DOUBLE) / n.n)
           |    * ln((CAST(c AS DOUBLE) * n.n)
           |          / (CAST(cx AS DOUBLE) * cy)), 9)
           |    AS DECIMAL(28,9))) AS DOUBLE) AS mi
           |  FROM g JOIN px USING (x) JOIN py USING (y) CROSS JOIN n),
           |hx AS (
           |  SELECT CAST(sum(CAST(round(-(CAST(cx AS DOUBLE) / n.n)
           |    * ln(CAST(cx AS DOUBLE) / n.n), 9) AS DECIMAL(28,9)))
           |    AS DOUBLE) AS hx
           |  FROM px CROSS JOIN n),
           |hy AS (
           |  SELECT CAST(sum(CAST(round(-(CAST(cy AS DOUBLE) / n.n)
           |    * ln(CAST(cy AS DOUBLE) / n.n), 9) AS DECIMAL(28,9)))
           |    AS DOUBLE) AS hy
           |  FROM py CROSS JOIN n)
           |SELECT n.n, round(mi, 9) AS mi_nats, round(hx, 9) AS h_type,
           |  round(hy, 9) AS h_bin,
           |  round(mi / LEAST(hx, hy), 6) AS nmi
           |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN n""".stripMargin),
    (s, d) => {
      val g = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy(col("event_type").as("x"),
          least((col("value") / 125).cast("long"), lit(7L)).as("y"))
        .agg(count(lit(1)).as("c")))
      val n = g.agg(sum("c").cast("long").as("n"))
      val px = g.groupBy("x").agg(sum("c").cast("long").as("cx"))
      val py = g.groupBy("y").agg(sum("c").cast("long").as("cy"))
      val mi = g.join(broadcast(px), "x").join(broadcast(py), "y")
        .crossJoin(broadcast(n))
        .agg(sum(round((col("c").cast("double") / col("n")) *
          log((col("c").cast("double") * col("n")) /
            (col("cx").cast("double") * col("cy"))), 9)
          .cast("decimal(28,9)")).cast("double").as("mi"))
      val hx = px.crossJoin(broadcast(n))
        .agg(sum(round(-(col("cx").cast("double") / col("n")) *
          log(col("cx").cast("double") / col("n")), 9)
          .cast("decimal(28,9)")).cast("double").as("hx"))
      val hy = py.crossJoin(broadcast(n))
        .agg(sum(round(-(col("cy").cast("double") / col("n")) *
          log(col("cy").cast("double") / col("n")), 9)
          .cast("decimal(28,9)")).cast("double").as("hy"))
      mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
        .crossJoin(broadcast(n))
        .select(col("n"), round(col("mi"), 9).as("mi_nats"),
          round(col("hx"), 9).as("h_type"), round(col("hy"), 9).as("h_bin"),
          round(col("mi") / least(col("hx"), col("hy")), 6).as("nmi"))
    })

  // O'Brien–Fleming two-sided 0.05 boundaries for K = 3 equally spaced
  // looks (published constants, shared 3-decimal literals)
  private val ObfZ = Seq(3.471, 2.454, 2.004)

  /** Group-sequential monitoring with O'Brien–Fleming boundaries — the
    * "peek three times without inflating α" counterpart to q272's SPRT:
    * the q270 two-proportion z recomputed on users enrolled (first
    * event) by each of three equally spaced calendar cutoffs, each look
    * compared to its OBF boundary. Per look: one filter on the user-
    * grid frame + exact conversion counts; the z formula mirrors q270
    * verbatim. Users×3 flat-map, grid aggregation — no per-look corpus
    * rescans. */
  val q322_group_sequential = Q(
    "q322_group_sequential", {
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      val bounds = ObfZ.zipWithIndex.map { case (z, i) =>
        s"WHEN ${i + 1} THEN $z"
      }.mkString(" ")
      Some(s"""WITH u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(max(CASE WHEN event_type = 'purchase'
              |      AND value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS conv,
              |    CAST(min(epoch_us(ts) // 86400000000) AS BIGINT)
              |      AS first_day
              |  FROM events GROUP BY 1, 2),
              |span AS (
              |  SELECT min(first_day) AS d0, max(first_day) AS d1 FROM u),
              |looks AS (
              |  SELECT g.look,
              |    d0 + ((d1 - d0) * g.look) // 3 AS cutoff
              |  FROM span CROSS JOIN (
              |    SELECT unnest(generate_series(1, 3)) AS look) g),
              |cells AS (
              |  SELECT l.look,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1,
              |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
              |      AS BIGINT) AS c0,
              |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
              |      AS BIGINT) AS c1
              |  FROM u JOIN looks l ON u.first_day <= l.cutoff
              |  GROUP BY l.look),
              |z AS (
              |  SELECT look, n0, n1,
              |    round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
              |      / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              |        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              |        * (1.0 / n0 + 1.0 / n1)), 6) AS z
              |  FROM cells)
              |SELECT look, n0, n1, z,
              |  CASE look $bounds END AS boundary,
              |  CASE WHEN abs(z) > (CASE look $bounds END)
              |    THEN 1 ELSE 0 END AS crossed
              |FROM z ORDER BY look""".stripMargin)
    },
    (s, d) => {
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"),
          (expr(hexSpanValSql("__h", 0, 2)) % 2).as("arm"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 250, 1L).otherwise(0L)).as("conv"),
          min(expr("(ts div 1000) div 86400000000")).as("first_day")))
      val span = u.agg(min("first_day").as("d0"), max("first_day").as("d1"))
      val looks = span
        .select(explode(sequence(lit(1L), lit(3L))).as("look"),
          col("d0"), col("d1"))
        .select(col("look"),
          (col("d0") + expr("((d1 - d0) * look) div 3")).as("cutoff"))
      val cells = u.join(broadcast(looks), col("first_day") <= col("cutoff"))
        .groupBy("look")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
      val pPool = (col("c0") + col("c1")).cast("double") /
        (col("n0") + col("n1"))
      val z = round((col("c1").cast("double") / col("n1") -
        col("c0").cast("double") / col("n0")) /
        sqrt(pPool * (lit(1) - pPool) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6)
      val boundary = ObfZ.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (acc, (b, i)) => when(col("look") === i + 1, b).otherwise(acc)
      }
      cells.select(col("look"), col("n0"), col("n1"), z.as("z"),
          boundary.as("boundary"),
          when(abs(z) > boundary, 1).otherwise(0).as("crossed"))
        .orderBy("look")
    })

  /** Overdispersion check per event type: variance-to-mean ratio of
    * DAILY counts on the DENSE day grid (zero-event days count — q227's
    * lesson; omitting them biases the variance down) and the dispersion
    * statistic (n−1)·VMR ~ χ²_{n−1} under Poisson — the diagnostic that
    * decides whether count models downstream need a negative-binomial.
    * Exact integer count moments per type; doubles only in the final
    * per-type row. */
  val q327_dispersion = Q(
    "q327_dispersion",
    Some("""WITH ev AS (
           |  SELECT event_type,
           |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           |  FROM events),
           |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
           |types AS (SELECT DISTINCT event_type FROM ev),
           |grid AS (
           |  SELECT t.event_type, g.day
           |  FROM span, types t, unnest(generate_series(d0, d1)) AS g(day)),
           |cnt AS (
           |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
           |  FROM ev GROUP BY 1, 2),
           |cells AS (
           |  SELECT grid.event_type, grid.day, COALESCE(cnt.c, 0) AS c
           |  FROM grid LEFT JOIN cnt
           |    ON grid.event_type = cnt.event_type AND grid.day = cnt.day),
           |m AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(sum(c) AS BIGINT) AS s,
           |    CAST(sum(c * c) AS BIGINT) AS ss
           |  FROM cells GROUP BY event_type)
           |SELECT event_type, n_days,
           |  round(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
           |  round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
           |    / (n_days - 1) / (CAST(s AS DOUBLE) / n_days), 6) AS vmr,
           |  round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
           |    / (CAST(s AS DOUBLE) / n_days), 6) AS stat,
           |  CAST(n_days - 1 AS BIGINT) AS df
           |FROM m ORDER BY event_type""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"))
      val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val types = ev.select("event_type").distinct()
      val grid = span
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .crossJoin(broadcast(types))
      val cnt = ev.groupBy("event_type", "day")
        .agg(count(lit(1)).as("c"))
      val cells = grid.join(cnt, Seq("event_type", "day"), "left")
        .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      val m = cells.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("c").cast("long").as("s"),
          sum(col("c") * col("c")).cast("long").as("ss"))
      val mean = col("s").cast("double") / col("n_days")
      val svar = (col("ss").cast("double") -
        col("s").cast("double") * col("s") / col("n_days")) /
        (col("n_days") - 1)
      m.select(col("event_type"), col("n_days"),
          round(mean, 6).as("mean_daily"),
          round(svar / mean, 6).as("vmr"),
          round((col("ss").cast("double") -
            col("s").cast("double") * col("s") / col("n_days")) / mean, 6)
            .as("stat"),
          (col("n_days") - 1).cast("long").as("df"))
        .orderBy("event_type")
    })

  val all: Seq[Q] = Seq(q318_permutation_test, q320_mi_feature,
    q322_group_sequential, q327_dispersion)
}
