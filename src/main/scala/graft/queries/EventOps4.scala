package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-10 event-series additions: row-pattern (MATCH_RECOGNIZE-style)
  * detection over daily aggregates.
  */
object EventOps4 {

  /** V-shape (drawdown-and-recovery) pattern detection per event type —
    * the MATCH_RECOGNIZE `(DOWN+ UP+)` idiom Spark SQL lacks, emulated
    * with gaps-and-islands: daily cent totals → day-over-day delta
    * signs → maximal constant-sign runs (island id = row_number −
    * per-sign row_number) → a DOWN island whose immediate successor is
    * an UP island forms a V; per type, report the DEEPEST V (largest
    * summed drawdown, tie → earliest). Flat days (delta 0) break
    * adjacency, so the pattern is strict: every step down, then every
    * step up.
    *
    * Scale shape: ONE corpus agg to the (type × day) grid; every
    * window thereafter partitions that bounded grid by type. The
    * corpus never sees a window — the same discipline the q358 rework
    * established. */
  val q387_vshape_pattern = Q(
    "q387_vshape_pattern",
    Some("""WITH day AS (
           |  SELECT event_type,
           |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           |      AS tot
           |  FROM events GROUP BY 1, 2),
           |del AS (
           |  SELECT event_type, day, tot,
           |    tot - lag(tot) OVER (PARTITION BY event_type ORDER BY day)
           |      AS delta
           |  FROM day),
           |sgn AS (
           |  SELECT event_type, day, delta,
           |    CASE WHEN delta > 0 THEN 1 WHEN delta < 0 THEN -1 ELSE 0 END
           |      AS sg,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day)
           |      AS idx
           |  FROM del WHERE delta IS NOT NULL),
           |isl AS (
           |  SELECT event_type, sg,
           |    min(day) AS first_day, max(day) AS last_day,
           |    CAST(sum(delta) AS BIGINT) AS move,
           |    min(idx) AS seq, CAST(count(*) AS BIGINT) AS len
           |  FROM (
           |    SELECT *, idx - row_number() OVER (
           |      PARTITION BY event_type, sg ORDER BY idx) AS grp
           |    FROM sgn) t
           |  GROUP BY event_type, sg, grp),
           |pair AS (
           |  SELECT a.event_type, a.first_day AS first_down_day,
           |    a.last_day AS trough_day, b.last_day AS recover_day,
           |    -a.move AS depth_cents, b.move AS recovery_cents
           |  FROM isl a JOIN isl b
           |    ON b.event_type = a.event_type AND b.seq = a.seq + a.len
           |   AND a.sg = -1 AND b.sg = 1),
           |best AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY depth_cents DESC, first_down_day) AS r
           |  FROM pair)
           |SELECT event_type, first_down_day, trough_day, recover_day,
           |  depth_cents, recovery_cents
           |FROM best WHERE r = 1 ORDER BY event_type""".stripMargin),
    (s, d) => {
      val day = Tables.events(s, d)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("c"))
        .groupBy("event_type", "day")
        .agg(sum("c").cast("long").as("tot"))
      val wDay = Window.partitionBy("event_type").orderBy("day")
      val del = day.withColumn("delta",
        col("tot") - lag("tot", 1).over(wDay))
      val sgn = del.filter(col("delta").isNotNull)
        .withColumn("sg",
          when(col("delta") > 0, 1).when(col("delta") < 0, -1).otherwise(0))
        .withColumn("idx", row_number().over(wDay))
      val isl = sgn
        .withColumn("grp", col("idx") - row_number().over(
          Window.partitionBy("event_type", "sg").orderBy("idx")))
        .groupBy("event_type", "sg", "grp")
        .agg(min("day").as("first_day"), max("day").as("last_day"),
          sum("delta").cast("long").as("move"),
          min("idx").as("seq"), count(lit(1)).as("len"))
      val a = isl.filter(col("sg") === -1).select(col("event_type"),
        col("first_day").as("first_down_day"),
        col("last_day").as("trough_day"),
        (-col("move")).as("depth_cents"),
        (col("seq") + col("len")).as("nxt"))
      val b = isl.filter(col("sg") === 1).select(col("event_type"),
        col("last_day").as("recover_day"),
        col("move").as("recovery_cents"), col("seq").as("nxt"))
      val pair = a.join(b, Seq("event_type", "nxt"))
      pair
        .withColumn("r", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("depth_cents").desc, col("first_down_day"))))
        .filter(col("r") === 1)
        .select("event_type", "first_down_day", "trough_day",
          "recover_day", "depth_cents", "recovery_cents")
        .orderBy("event_type")
    })

  private val PhDelta = 0L // tolerated per-day drift, cents
  private val PhLambda = 100000L // alarm threshold, cents

  /** Page–Hinkley change detection per event type — the sequential
    * drift alarm (the PH test behind most stream-drift monitors, here
    * in its batch-replay form): over daily cent totals x_t, the
    * cumulative deviation m_t = Σ_{i≤t}(x_i − mean(x_1..x_i) − δ)
    * minus its running minimum exceeds λ ⇒ alarm. The running mean is
    * taken as FLOOR(S_i / i) so the entire recursion stays in exact
    * BIGINTs on both engines — a windowed double prefix-sum would hit
    * DuckDB's segment-tree addition order vs Spark's running
    * accumulation and diverge in the last ulp; floor-mean changes the
    * statistic by < 1 cent per step and is stated, not hidden.
    *
    * Scale shape: one corpus agg to the (type × day) grid; every
    * window (prefix sum, prefix min) partitions that grid by type. */
  val q396_page_hinkley = Q(
    "q396_page_hinkley",
    Some(s"""WITH day AS (
            |  SELECT event_type,
            |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
            |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
            |      AS tot
            |  FROM events GROUP BY 1, 2),
            |pre AS (
            |  SELECT event_type, day, tot,
            |    CAST(sum(tot) OVER w AS BIGINT) AS s,
            |    row_number() OVER w AS i
            |  FROM day
            |  WINDOW w AS (PARTITION BY event_type ORDER BY day
            |    ROWS UNBOUNDED PRECEDING)),
            |dev AS (
            |  SELECT event_type, day,
            |    tot - s // i - $PhDelta AS d
            |  FROM pre),
            |m AS (
            |  SELECT event_type, day,
            |    CAST(sum(d) OVER w AS BIGINT) AS mt
            |  FROM dev
            |  WINDOW w AS (PARTITION BY event_type ORDER BY day
            |    ROWS UNBOUNDED PRECEDING)),
            |ph AS (
            |  SELECT event_type, day,
            |    mt - min(mt) OVER (PARTITION BY event_type ORDER BY day
            |      ROWS UNBOUNDED PRECEDING) AS ph
            |  FROM m)
            |SELECT event_type,
            |  CAST(sum(CASE WHEN ph > $PhLambda THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_alarm_days,
            |  min(CASE WHEN ph > $PhLambda THEN day END) AS first_alarm_day,
            |  CAST(max(ph) AS BIGINT) AS max_ph
            |FROM ph GROUP BY event_type
            |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val day = Tables.events(s, d)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("c"))
        .groupBy("event_type", "day")
        .agg(sum("c").cast("long").as("tot"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dev = day
        .withColumn("s", sum("tot").over(w).cast("long"))
        .withColumn("i", row_number().over(
          Window.partitionBy("event_type").orderBy("day")))
        .select(col("event_type"), col("day"),
          (col("tot") - expr("s div i") - PhDelta).as("d"))
      val ph = dev
        .withColumn("mt", sum("d").over(w).cast("long"))
        .withColumn("ph", col("mt") - min("mt").over(w))
      ph.groupBy("event_type")
        .agg(sum(when(col("ph") > PhLambda, 1L).otherwise(0L)).cast("long")
            .as("n_alarm_days"),
          min(when(col("ph") > PhLambda, col("day"))).as("first_alarm_day"),
          max("ph").cast("long").as("max_ph"))
        .orderBy("event_type")
    })

  private val FwDeltaUs = 7L * 86400000000L // 7-day step window

  /** Time-window funnel with EXISTENTIAL semantics — signup → click →
    * purchase where each step lands within 7 days of the previous —
    * next to the naive greedy-earliest count, which is WRONG under
    * windows: anchoring on the user's first signup misses users whose
    * later signup starts the only valid chain (signup day 0 and 50,
    * click day 56 → greedy pairs 0→56 and fails; the 50→56 chain
    * converts). Correct semantics: any click with some signup in its
    * trailing window is reachable; any purchase with some reachable
    * click converts. The entry reports both counts so the gap is
    * measured, not argued.
    *
    * Scale shape: per-(user, type) the corpus collapses to event lists
    * only via user-keyed equi-joins; the step joins are user-local
    * (per-user event counts bound the pair work). Greedy chain = three
    * user-keyed min-aggs, q69's shape plus the window predicate. */
  val q402_funnel_window = Q(
    "q402_funnel_window",
    Some(s"""WITH ev AS (
            |  SELECT user_id, event_type,
            |    CAST(epoch_us(ts) AS BIGINT) AS tus
            |  FROM events),
            |sg AS (SELECT user_id, tus FROM ev WHERE event_type = 'signup'),
            |ck AS (SELECT user_id, tus FROM ev WHERE event_type = 'click'),
            |pu AS (SELECT user_id, tus FROM ev WHERE event_type = 'purchase'),
            |valid_ck AS (
            |  SELECT DISTINCT c.user_id, c.tus
            |  FROM ck c JOIN sg s ON s.user_id = c.user_id
            |   AND s.tus <= c.tus AND c.tus - s.tus <= $FwDeltaUs),
            |conv AS (
            |  SELECT DISTINCT p.user_id
            |  FROM pu p JOIN valid_ck v ON v.user_id = p.user_id
            |   AND v.tus <= p.tus AND p.tus - v.tus <= $FwDeltaUs),
            |greedy AS (
            |  SELECT g1.user_id,
            |    min(CASE WHEN p.tus >= g1.c
            |      AND p.tus - g1.c <= $FwDeltaUs THEN p.tus END) AS p
            |  FROM (
            |    SELECT c.user_id, min(c.tus) AS c
            |    FROM ck c JOIN (SELECT user_id, min(tus) AS s FROM sg
            |                    GROUP BY user_id) f
            |      ON f.user_id = c.user_id AND c.tus >= f.s
            |     AND c.tus - f.s <= $FwDeltaUs
            |    GROUP BY c.user_id) g1
            |  LEFT JOIN pu p ON p.user_id = g1.user_id
            |  GROUP BY g1.user_id)
            |SELECT
            |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev)
            |    AS n_users,
            |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM sg)
            |    AS n_signup,
            |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM valid_ck)
            |    AS n_sc_exists,
            |  (SELECT CAST(count(*) AS BIGINT) FROM conv) AS n_scp_exists,
            |  (SELECT CAST(count(p) AS BIGINT) FROM greedy)
            |    AS n_scp_greedy""".stripMargin),
    (s, d) => {
      val ev = graft.operators.PlanCache.persist(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus")))
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select("user_id", "tus")
      val sg = typed("signup")
      val ck = typed("click")
      val pu = typed("purchase")
      val validCk = graft.operators.PlanCache.persist(
        ck.toDF("user_id", "ctus")
          .join(sg.toDF("user_id", "stus"), "user_id")
          .filter(col("stus") <= col("ctus") &&
            col("ctus") - col("stus") <= FwDeltaUs)
          .select(col("user_id"), col("ctus")).distinct())
      val conv = pu.toDF("user_id", "ptus")
        .join(validCk, "user_id")
        .filter(col("ctus") <= col("ptus") &&
          col("ptus") - col("ctus") <= FwDeltaUs)
        .select("user_id").distinct()
      val firstSg = sg.groupBy("user_id").agg(min("tus").as("s"))
      val greedyCk = ck.toDF("user_id", "ctus").join(firstSg, "user_id")
        .filter(col("ctus") >= col("s") &&
          col("ctus") - col("s") <= FwDeltaUs)
        .groupBy("user_id").agg(min("ctus").as("c"))
      val greedy = greedyCk
        .join(pu.toDF("user_id", "ptus"), Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(min(when(col("ptus") >= col("c") &&
          col("ptus") - col("c") <= FwDeltaUs, col("ptus"))).as("p"))
      val c1 = ev.agg(countDistinct("user_id").as("n_users"))
      val c2 = sg.agg(countDistinct("user_id").as("n_signup"))
      val c3 = validCk.agg(countDistinct("user_id").as("n_sc_exists"))
      val c4 = conv.agg(count(lit(1)).as("n_scp_exists"))
      val c5 = greedy.agg(count(col("p")).as("n_scp_greedy"))
      broadcast(c1).crossJoin(broadcast(c2)).crossJoin(broadcast(c3))
        .crossJoin(broadcast(c4)).crossJoin(broadcast(c5))
    })

  private val LbR = 3 // warping-envelope half-width, days

  /** LB_Keogh lower bound between every event-type pair's daily series
    * — the envelope pruning bound that makes DTW search tractable
    * (Keogh 2002): candidate b's ±3-day sliding min/max envelope
    * [L, U], and LB(a, b) = Σ_days (a−U)² above + (L−a)² below. A
    * true lower bound on DTW(a, b) with warping window r, computable
    * with plain sliding windows — no quadratic DP — which is exactly
    * why real systems evaluate IT first and run DTW only on survivors.
    * All arithmetic in exact cent BIGINTs (squares of daily-total gaps
    * stay < 2⁶³ at any plausible day volume… displayed as dollars²).
    *
    * Scale shape: one corpus agg to the (type × day) grid; envelopes
    * are rowsBetween(−r, r) windows per type on grid rows; the pair
    * join is day-keyed on the grid. NOT symmetric (envelope on b) —
    * both directions reported. */
  val q424_lb_keogh = Q(
    "q424_lb_keogh",
    Some(s"""WITH day AS (
            |  SELECT event_type,
            |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
            |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
            |      AS tot
            |  FROM events GROUP BY 1, 2),
            |env AS (
            |  SELECT event_type, day, tot,
            |    CAST(max(tot) OVER w AS BIGINT) AS u,
            |    CAST(min(tot) OVER w AS BIGINT) AS l
            |  FROM day
            |  WINDOW w AS (PARTITION BY event_type ORDER BY day
            |    ROWS BETWEEN $LbR PRECEDING AND $LbR FOLLOWING)),
            |pair AS (
            |  SELECT a.event_type AS type_a, b.event_type AS type_b,
            |    CAST(sum(CASE WHEN a.tot > b.u
            |        THEN (a.tot - b.u) * (a.tot - b.u)
            |      WHEN a.tot < b.l THEN (b.l - a.tot) * (b.l - a.tot)
            |      ELSE 0 END) AS BIGINT) AS lb_cents2,
            |    CAST(count(*) AS BIGINT) AS n_days
            |  FROM day a JOIN env b
            |    ON b.day = a.day AND b.event_type <> a.event_type
            |  GROUP BY 1, 2)
            |SELECT type_a, type_b, n_days,
            |  round(CAST(lb_cents2 AS DOUBLE) / 10000, 4) AS lb_keogh
            |FROM pair ORDER BY type_a, type_b""".stripMargin),
    (s, d) => {
      val day = graft.operators.PlanCache.persist(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"),
            round(col("value") * 100, 0).cast("long").as("c"))
          .groupBy("event_type", "day")
          .agg(sum("c").cast("long").as("tot")))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-LbR, LbR)
      val env = day
        .withColumn("u", max("tot").over(w).cast("long"))
        .withColumn("l", min("tot").over(w).cast("long"))
      day.toDF("type_a", "day", "ta")
        .join(env.toDF("type_b", "day", "tb", "u", "l"), "day")
        .filter(col("type_b") =!= col("type_a"))
        .groupBy("type_a", "type_b")
        .agg(sum(when(col("ta") > col("u"),
            (col("ta") - col("u")) * (col("ta") - col("u")))
          .when(col("ta") < col("l"),
            (col("l") - col("ta")) * (col("l") - col("ta")))
          .otherwise(0L)).cast("long").as("lb_cents2"),
          count(lit(1)).as("n_days"))
        .select(col("type_a"), col("type_b"), col("n_days"),
          round(col("lb_cents2").cast("double") / 10000, 4).as("lb_keogh"))
        .orderBy("type_a", "type_b")
    })

  private val MkChannels = Seq("click", "error", "signup", "view")

  /** Markov REMOVAL-EFFECT attribution — the data-driven counterpart
    * of q197's first/last-touch rules: model the user journey as the
    * event-type Markov chain (q325's transition matrix + its
    * within-K=3 absorption recursion), take the baseline conversion
    * mass B = Σ_s π(s)·r₃(s) from the first-event start distribution
    * π, then for each channel c recompute B with c REMOVED (its
    * from-states dropped, carries through it lost) — the fraction of
    * conversion that disappears is c's removal effect, normalized into
    * attribution shares. Every chain quantity lives on the ≤5×5 type
    * grid: 5 variants × 3 recursion steps are 1-row/25-row broadcast
    * algebra, identical at any event volume; the only row-scale work
    * is the one user-keyed lead() pass that counts transitions (and
    * the rn=1 first-event pass), both user-PARTITIONED.
    *
    * Determinism: transition probs and π round at 9; every carry and
    * mass term rounds at 9 then decimal-sums (q325's discipline);
    * shares derive from the ROUNDED removal effects. */
  val q442_markov_attribution = Q(
    "q442_markov_attribution", {
      def variant(tag: String, rm: Option[String]) = {
        val stFilter = rm.map(c => s" WHERE state <> '$c'").getOrElse("")
        val rmTo = rm.map(c => s" AND p.to_type <> '$c'").getOrElse("")
        s"""r1_$tag AS (
           |  SELECT st.state, coalesce(pp.p, 0) AS r
           |  FROM (SELECT state FROM states$stFilter) st
           |  LEFT JOIN (SELECT from_type AS state, p FROM p
           |             WHERE to_type = 'purchase') pp USING (state)),
           |r2_$tag AS (
           |  SELECT r1.state, round(r1.r + coalesce(c.carry, 0), 9) AS r
           |  FROM r1_$tag r1 LEFT JOIN (
           |    SELECT p.from_type AS state,
           |      CAST(sum(CAST(round(p.p * r.r, 9) AS DECIMAL(28,9)))
           |        AS DOUBLE) AS carry
           |    FROM p JOIN r1_$tag r ON r.state = p.to_type
           |    WHERE p.to_type <> 'purchase'$rmTo
           |    GROUP BY p.from_type) c ON c.state = r1.state),
           |r3_$tag AS (
           |  SELECT r1.state, round(r1.r + coalesce(c.carry, 0), 9) AS r
           |  FROM r1_$tag r1 LEFT JOIN (
           |    SELECT p.from_type AS state,
           |      CAST(sum(CAST(round(p.p * r.r, 9) AS DECIMAL(28,9)))
           |        AS DOUBLE) AS carry
           |    FROM p JOIN r2_$tag r ON r.state = p.to_type
           |    WHERE p.to_type <> 'purchase'$rmTo
           |    GROUP BY p.from_type) c ON c.state = r1.state),
           |b_$tag AS (
           |  SELECT round(CAST(sum(CAST(round(pi.pi * r.r, 9)
           |    AS DECIMAL(28,9))) AS DOUBLE), 9) AS b
           |  FROM pi JOIN r3_$tag r USING (state))""".stripMargin
      }
      val variants = variant("base", None) +: MkChannels.map(c =>
        variant(c, Some(c)))
      val reCols = MkChannels.map(c =>
        s"round(CASE WHEN b_base.b > 0 THEN (b_base.b - b_$c.b) / b_base.b " +
          s"ELSE 0 END, 9) AS re_$c").mkString(",\n    ")
      val sumRe = MkChannels.map(c => s"re_$c").mkString(" + ")
      val rows = MkChannels.map(c =>
        s"""SELECT '$c' AS channel, round(b_base, 9) AS base_conv,
           |  round(b_rm_$c, 9) AS b_removed, re_$c AS removal_effect,
           |  round(CASE WHEN $sumRe <> 0 THEN re_$c / ($sumRe)
           |    ELSE 0 END, 6) AS attribution_share
           |FROM w""".stripMargin).mkString("\nUNION ALL\n")
      Some((s"""WITH s AS (
           |  SELECT user_id, event_type,
           |    CAST(epoch_us(ts) AS BIGINT) AS us, event_id
           |  FROM events),
           |nx AS (
           |  SELECT event_type, LEAD(event_type) OVER (
           |    PARTITION BY user_id ORDER BY us, event_id) AS next_type
           |  FROM s),
           |t AS (
           |  SELECT event_type AS from_type, next_type AS to_type,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
           |p AS (
           |  SELECT from_type, to_type,
           |    round(CAST(n AS DOUBLE) / sum(n) OVER (
           |      PARTITION BY from_type), 9) AS p
           |  FROM t),
           |fe AS (
           |  SELECT event_type AS state FROM (
           |    SELECT event_type, ROW_NUMBER() OVER (
           |      PARTITION BY user_id ORDER BY us, event_id) AS rn
           |    FROM s) f WHERE rn = 1),
           |pi AS (
           |  SELECT state,
           |    round(CAST(count(*) AS DOUBLE)
           |      / (SELECT count(*) FROM fe), 9) AS pi
           |  FROM fe GROUP BY state),
           |states AS (SELECT DISTINCT from_type AS state FROM p),
           |""" + variants.mkString(",\n") + s""",
           |w AS (
           |  SELECT b_base.b AS b_base,
           |    ${MkChannels.map(c => s"b_$c.b AS b_rm_$c").mkString(", ")},
           |    $reCols
           |  FROM b_base${MkChannels.map(c => s" CROSS JOIN b_$c").mkString})
           |$rows
           |ORDER BY channel""").stripMargin)
    },
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val sdf = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("us"), col("event_id"))
      val t = sdf
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val p = graft.operators.PlanCache.persist(t.select(
        col("from_type"), col("to_type"),
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy("from_type")), 9).as("p")))
      val fe = sdf.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("event_type").as("state"))
      val nUsers = fe.agg(count(lit(1)).as("nu"))
      val pi = graft.operators.PlanCache.persist(
        fe.groupBy("state").agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(nUsers))
          .select(col("state"),
            round(col("c").cast("double") / col("nu"), 9).as("pi")))
      val states = p.select(col("from_type").as("state")).distinct()
      val pp = p.filter(col("to_type") === "purchase")
        .select(col("from_type").as("state"), col("p").as("ppp"))
      def dsum9(c: org.apache.spark.sql.Column) =
        sum(round(c, 9).cast("decimal(28,9)")).cast("double")
      def bOf(rm: Option[String]): org.apache.spark.sql.DataFrame = {
        val st = rm.map(c => states.filter(col("state") =!= c))
          .getOrElse(states)
        val base = graft.operators.PlanCache.persist(
          st.join(pp, Seq("state"), "left")
            .select(col("state"), coalesce(col("ppp"), lit(0.0)).as("r1")))
        def step(prev: org.apache.spark.sql.DataFrame) = {
          val pc = rm.map(c => p.filter(col("to_type") =!= c)).getOrElse(p)
          val carry = pc.filter(col("to_type") =!= "purchase")
            .join(prev.select(col("state").as("to_type"), col("r")),
              "to_type")
            .groupBy(col("from_type").as("state"))
            .agg(dsum9(col("p") * col("r")).as("carry"))
          base.join(carry, Seq("state"), "left")
            .select(col("state"),
              round(col("r1") + coalesce(col("carry"), lit(0.0)), 9).as("r"))
        }
        val r3 = step(step(base.select(col("state"), col("r1").as("r"))))
        pi.join(r3, "state")
          .agg(round(dsum9(col("pi") * col("r")), 9).as("b"))
      }
      val bBase = bOf(None).withColumnRenamed("b", "b_base")
      val withRm = MkChannels.foldLeft(bBase) { (acc, c) =>
        acc.crossJoin(broadcast(bOf(Some(c)).withColumnRenamed("b", s"b_rm_$c")))
      }
      val wRe = withRm.select(col("*") +: MkChannels.map(c =>
        round(when(col("b_base") > 0,
          (col("b_base") - col(s"b_rm_$c")) / col("b_base")).otherwise(0), 9)
          .as(s"re_$c")): _*)
      val sumRe = MkChannels.map(c => col(s"re_$c")).reduce(_ + _)
      val rows = MkChannels.map { c =>
        wRe.select(lit(c).as("channel"),
          round(col("b_base"), 9).as("base_conv"),
          round(col(s"b_rm_$c"), 9).as("b_removed"),
          col(s"re_$c").as("removal_effect"),
          round(when(sumRe =!= 0, col(s"re_$c") / sumRe).otherwise(0), 6)
            .as("attribution_share"))
      }
      rows.reduce(_.unionAll(_)).orderBy("channel")
    })

  val all: Seq[Q] = Seq(q387_vshape_pattern, q396_page_hinkley,
    q402_funnel_window, q424_lb_keogh, q442_markov_attribution)
}
