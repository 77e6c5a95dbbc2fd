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
      // VARIANT DIMENSION (the q174/q384 one-pass device): instead of
      // five separate job cascades (base + 4 removals), every chain
      // frame carries a `variant` column — the state set, the carry
      // edges, and the recursion all live on a (variant × ≤5-state)
      // grid, so the whole attribution costs ONE cascade of tiny jobs
      // regardless of how many channels are removed. Arithmetic per
      // variant is unchanged (same rounding points), so results are
      // bit-identical to the per-variant runs the oracle replays.
      val variants = { import s.implicits._
        (("base", null: String) +: MkChannels.map(c => (c, c)))
          .toDF("variant", "rm") }
      val stV = states.crossJoin(broadcast(variants))
        .filter(col("rm").isNull || col("state") =!= col("rm"))
      val baseV = graft.operators.PlanCache.persist(
        stV.join(pp, Seq("state"), "left")
          .select(col("variant"), col("rm"), col("state"),
            coalesce(col("ppp"), lit(0.0)).as("r1")))
      def step(prev: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val carry = p.filter(col("to_type") =!= "purchase")
          .crossJoin(broadcast(variants.select(col("variant"),
            col("rm").as("rmv"))))
          .filter(col("rmv").isNull || col("to_type") =!= col("rmv"))
          .join(prev.select(col("variant"), col("state").as("to_type"),
            col("r")), Seq("variant", "to_type"))
          .groupBy(col("variant"), col("from_type").as("state"))
          .agg(dsum9(col("p") * col("r")).as("carry"))
        baseV.join(carry, Seq("variant", "state"), "left")
          .select(col("variant"), col("state"),
            round(col("r1") + coalesce(col("carry"), lit(0.0)), 9).as("r"))
      }
      val r3 = step(step(baseV.select(col("variant"), col("state"),
        col("r1").as("r"))))
      val bV = pi.join(r3, "state")
        .groupBy("variant")
        .agg(round(dsum9(col("pi") * col("r")), 9).as("b"))
      // pivot the ≤5-row (variant, b) frame into one row of b-columns
      val bCols = max(when(col("variant") === "base", col("b")))
        .as("b_base") +:
        MkChannels.map(c => max(when(col("variant") === c, col("b")))
          .as(s"b_rm_$c"))
      val withRm = bV.agg(bCols.head, bCols.tail: _*)
      val wRe = withRm.select(col("*") +: MkChannels.map(c =>
        round(when(col("b_base") > 0,
          (col("b_base") - col(s"b_rm_$c")) / col("b_base")).otherwise(0), 9)
          .as(s"re_$c")): _*)
      val sumRe = MkChannels.map(c => col(s"re_$c")).reduce(_ + _)
      // stack() fans the 1-row effect frame into the per-channel rows in
      // ONE evaluation — the 4-way unionAll re-planned (and re-ran) the
      // whole chain cascade per channel (2553-line plan, 267 Exchanges;
      // r16). Identical values: same rounding points per field.
      val stackExpr = s"stack(${MkChannels.size}, " + MkChannels.map(c =>
        s"'$c', b_rm_$c, re_$c").mkString(", ") +
        ") AS (channel, b_removed_raw, removal_effect)"
      wRe.withColumn("__sum_re", sumRe)
        .select(expr(stackExpr), round(col("b_base"), 9).as("base_conv"),
          col("__sum_re"))
        .select(col("channel"), col("base_conv"),
          round(col("b_removed_raw"), 9).as("b_removed"),
          col("removal_effect"),
          round(when(col("__sum_re") =!= 0,
            col("removal_effect") / col("__sum_re")).otherwise(0), 6)
            .as("attribution_share"))
        .orderBy("channel")
    })

  /** Markov ENTROPY RATE of user behavior — how predictable is the
    * next event given the current one: H(s) = −Σ_t p(s→t)·log2 p(s→t)
    * per state, and the chain rate Σ_s π̂(s)·H(s) with π̂ the empirical
    * from-state share. Low rate = templated/bot-like traffic; ~log2(5)
    * = uniform churn. Complements q113 (the matrix itself) and q109
    * (token-level entropy) with the SEQUENCE-level number.
    *
    * Determinism: each p rounds at 9; each p·log2 p term rounds at 9
    * and decimal-sums (the q345 log discipline); π̂ rounds at 9; the
    * rate is a decimal sum of rounded per-state contributions.
    *
    * Scale shape: one user-partitioned lead() pass → the ≤5×5
    * transition grid; everything after is 5-row algebra. */
  val q445_entropy_rate = Q(
    "q445_entropy_rate",
    Some("""WITH s AS (
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
           |ft AS (
           |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM t
           |  GROUP BY from_type),
           |alln AS (SELECT CAST(sum(n) AS BIGINT) AS alln FROM t),
           |p AS (
           |  SELECT t.from_type, round(CAST(t.n AS DOUBLE) / ft.tot, 9)
           |    AS p
           |  FROM t JOIN ft ON ft.from_type = t.from_type),
           |h AS (
           |  SELECT from_type AS state,
           |    round(CAST(sum(CAST(round(-p * log2(p), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE), 6) AS h_bits
           |  FROM p WHERE p > 0 GROUP BY from_type),
           |pih AS (
           |  SELECT h.state,
           |    round(CAST(ft.tot AS DOUBLE) / alln.alln, 9) AS pi,
           |    h.h_bits
           |  FROM h JOIN ft ON ft.from_type = h.state CROSS JOIN alln),
           |rate AS (
           |  SELECT round(CAST(sum(CAST(round(pi * h_bits, 9)
           |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy_rate
           |  FROM pih)
           |SELECT state, round(pi, 6) AS pi, h_bits,
           |  round(pi * h_bits, 6) AS contribution, entropy_rate
           |FROM pih CROSS JOIN rate
           |ORDER BY state""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val sdf = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("us"), col("event_id"))
      val t = graft.operators.PlanCache.persist(sdf
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n")))
      val ft = t.groupBy("from_type").agg(sum("n").cast("long").as("tot"))
      val alln = t.agg(sum("n").cast("long").as("alln"))
      val p = t.join(broadcast(ft), "from_type")
        .select(col("from_type"),
          round(col("n").cast("double") / col("tot"), 9).as("p"))
      val h = p.filter(col("p") > 0).groupBy(col("from_type").as("state"))
        .agg(round(sum(round(-col("p") * log2(col("p")), 9)
          .cast("decimal(28,9)")).cast("double"), 6).as("h_bits"))
      val pih = h.join(broadcast(ft.withColumnRenamed("from_type", "state")),
          "state")
        .crossJoin(broadcast(alln))
        .select(col("state"),
          round(col("tot").cast("double") / col("alln"), 9).as("pi"),
          col("h_bits"))
      val rate = pih.agg(round(sum(round(col("pi") * col("h_bits"), 9)
        .cast("decimal(28,9)")).cast("double"), 6).as("entropy_rate"))
      pih.crossJoin(broadcast(rate))
        .select(col("state"), round(col("pi"), 6).as("pi"), col("h_bits"),
          round(col("pi") * col("h_bits"), 6).as("contribution"),
          col("entropy_rate"))
        .orderBy("state")
    })

  /** BINARY SEGMENTATION change-point detection on the daily-spend
    * series — the top-down counterpart of q273's Pettitt (single shift
    * test) and q167's CUSUM (fixed-mean chart): split 1 minimizes
    * total within-segment SSE over all cut points; split 2 re-runs the
    * search inside both resulting segments and keeps the better cut —
    * the first two nodes of the CART-on-time tree. Every SSE comes
    * from day-grid PREFIX sums ((n, Σy, Σy²) per prefix, the q436
    * moments), so each candidate evaluates O(1) and the whole search
    * is two sweeps of the bounded day grid. SSEs are reported in
    * millions (round 6) so the rounding sits far above the double ulp
    * (the r10 magnitude discipline).
    *
    * Scale shape: one corpus agg to the day grid; prefix windows on
    * the grid; argmins as TakeOrdered(1); two 1-row broadcasts. */
  val q443_binary_segmentation = Q(
    "q443_binary_segmentation",
    Some("""WITH daily AS (
           |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
           |      AS y
           |  FROM events GROUP BY 1),
           |tot AS (
           |  SELECT CAST(count(*) AS BIGINT) AS dd,
           |    CAST(CAST(sum(y) AS DECIMAL(38,2)) AS DOUBLE) AS sd,
           |    CAST(CAST(sum(CAST(y * y AS DECIMAL(38,4))) AS DECIMAL(38,4))
           |      AS DOUBLE) AS qd
           |  FROM daily),
           |g AS (
           |  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS r,
           |    CAST(CAST(sum(y) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS cs,
           |    CAST(CAST(sum(CAST(y * y AS DECIMAL(38,4))) OVER w
           |      AS DECIMAL(38,4)) AS DOUBLE) AS cq
           |  FROM daily
           |  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
           |s0 AS (
           |  SELECT round((qd - sd * sd / dd) / 1000000.0, 6) AS sse0_m
           |  FROM tot),
           |c1 AS (
           |  SELECT g.r AS t, g.day, g.cs AS cs1, g.cq AS cq1,
           |    round(((cq - cs * cs / r)
           |      + ((qd - cq) - (sd - cs) * (sd - cs) / (dd - r)))
           |      / 1000000.0, 6) AS sse_m
           |  FROM g CROSS JOIN tot WHERE g.r < dd),
           |b1 AS (SELECT * FROM c1 ORDER BY sse_m, t LIMIT 1),
           |c2 AS (
           |  SELECT g.r, g.day,
           |    round((CASE WHEN g.r < b1.t THEN
           |      ((qd - b1.cq1) - (sd - b1.cs1) * (sd - b1.cs1) / (dd - b1.t))
           |      + (g.cq - g.cs * g.cs / g.r)
           |      + ((b1.cq1 - g.cq)
           |         - (b1.cs1 - g.cs) * (b1.cs1 - g.cs) / (b1.t - g.r))
           |    ELSE
           |      (b1.cq1 - b1.cs1 * b1.cs1 / b1.t)
           |      + ((g.cq - b1.cq1)
           |         - (g.cs - b1.cs1) * (g.cs - b1.cs1) / (g.r - b1.t))
           |      + ((qd - g.cq) - (sd - g.cs) * (sd - g.cs) / (dd - g.r))
           |    END) / 1000000.0, 6) AS after_m
           |  FROM g CROSS JOIN b1 CROSS JOIN tot
           |  WHERE g.r < dd AND g.r <> b1.t),
           |b2 AS (SELECT * FROM c2 ORDER BY after_m, r LIMIT 1)
           |SELECT 1 AS split_no, b1.day AS boundary_day,
           |  s0.sse0_m AS sse_before_m, b1.sse_m AS sse_after_m,
           |  round(s0.sse0_m - b1.sse_m, 6) AS gain_m
           |FROM b1 CROSS JOIN s0
           |UNION ALL
           |SELECT 2, b2.day, b1.sse_m, b2.after_m,
           |  round(b1.sse_m - b2.after_m, 6)
           |FROM b2 CROSS JOIN b1
           |ORDER BY split_no""".stripMargin),
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(Q.dec(col("value"))).cast("decimal(18,2)").as("y"))
      val wc = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = graft.operators.PlanCache.persist(daily.select(col("day"),
        row_number().over(Window.orderBy("day")).as("r"),
        sum("y").over(wc).cast("decimal(38,2)").cast("double").as("cs"),
        sum((col("y") * col("y")).cast("decimal(38,4)")).over(wc)
          .cast("decimal(38,4)").cast("double").as("cq")))
      val tot = daily.agg(count(lit(1)).as("dd"),
        sum("y").cast("decimal(38,2)").cast("double").as("sd"),
        sum((col("y") * col("y")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").cast("double").as("qd"))
      val s0 = tot.select(
        round((col("qd") - col("sd") * col("sd") / col("dd")) / 1000000.0,
          6).as("sse0_m"))
      val c1 = g.crossJoin(broadcast(tot)).filter(col("r") < col("dd"))
        .select(col("r").as("t"), col("day"),
          col("cs").as("cs1"), col("cq").as("cq1"),
          round(((col("cq") - col("cs") * col("cs") / col("r"))
            + ((col("qd") - col("cq")) - (col("sd") - col("cs"))
              * (col("sd") - col("cs")) / (col("dd") - col("r"))))
            / 1000000.0, 6).as("sse_m"))
      val b1 = c1.orderBy(col("sse_m"), col("t")).limit(1)
      val afterLeft =
        ((col("qd") - col("cq1")) - (col("sd") - col("cs1"))
          * (col("sd") - col("cs1")) / (col("dd") - col("t"))) +
        (col("cq") - col("cs") * col("cs") / col("r")) +
        ((col("cq1") - col("cq")) - (col("cs1") - col("cs"))
          * (col("cs1") - col("cs")) / (col("t") - col("r")))
      val afterRight =
        (col("cq1") - col("cs1") * col("cs1") / col("t")) +
        ((col("cq") - col("cq1")) - (col("cs") - col("cs1"))
          * (col("cs") - col("cs1")) / (col("r") - col("t"))) +
        ((col("qd") - col("cq")) - (col("sd") - col("cs"))
          * (col("sd") - col("cs")) / (col("dd") - col("r")))
      val c2 = g.crossJoin(broadcast(b1.select(col("t"), col("cs1"),
          col("cq1"), col("sse_m").as("sse1_m"))))
        .crossJoin(broadcast(tot))
        .filter(col("r") < col("dd") && col("r") =!= col("t"))
        .select(col("r"), col("day"), col("sse1_m"),
          round(when(col("r") < col("t"), afterLeft)
            .otherwise(afterRight) / 1000000.0, 6).as("after_m"))
      val b2 = c2.orderBy(col("after_m"), col("r")).limit(1)
      val row1 = b1.crossJoin(broadcast(s0))
        .select(lit(1).as("split_no"), col("day").as("boundary_day"),
          col("sse0_m").as("sse_before_m"), col("sse_m").as("sse_after_m"),
          round(col("sse0_m") - col("sse_m"), 6).as("gain_m"))
      val row2 = b2
        .select(lit(2).as("split_no"), col("day").as("boundary_day"),
          col("sse1_m").as("sse_before_m"), col("after_m").as("sse_after_m"),
          round(col("sse1_m") - col("after_m"), 6).as("gain_m"))
      row1.unionAll(row2).orderBy("split_no")
    })

  /** Half-life DECAYED engagement score — the recency weighting every
    * ranking/retention feature store applies, computed EXACTLY: weight
    * = 2^(−age_weeks) with a 1-week half-life, and because the
    * exponent is an INTEGER bucket the weight is an exact power of two
    * (1.0 / (1<<k)) — no pow()/exp() ulp divergence (the repo's libm
    * ban). Per (user, week-age) exact decimal sums divide by the exact
    * weight, round at 9, and decimal-sum per user; top-15 by decayed
    * score against the raw total shows whose activity is FRESH vs
    * merely large.
    *
    * Scale shape: one (user, age-bucket) hash agg (≤ ~14 buckets per
    * user), a 1-row max-day broadcast, TakeOrdered top-15. */
  val q446_decayed_engagement = Q(
    "q446_decayed_engagement",
    Some("""WITH ev AS (
           |  SELECT user_id,
           |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           |    CAST(value AS DECIMAL(18,2)) AS v
           |  FROM events),
           |mx AS (SELECT CAST(max(day) AS BIGINT) AS mxd FROM ev),
           |uk AS (
           |  SELECT user_id, CAST((mxd - day) // 7 AS BIGINT) AS k,
           |    CAST(sum(v) AS DECIMAL(38,2)) AS sk
           |  FROM ev CROSS JOIN mx GROUP BY 1, 2),
           |u AS (
           |  SELECT user_id,
           |    CAST(CAST(sum(sk) AS DECIMAL(38,2)) AS DOUBLE) AS raw_total,
           |    round(CAST(sum(CAST(round(CAST(sk AS DOUBLE)
           |      / (CAST(1 AS BIGINT) << LEAST(k, 62)), 9) AS DECIMAL(28,9)))
           |      AS DOUBLE), 6) AS decayed
           |  FROM uk GROUP BY user_id)
           |SELECT user_id, round(raw_total, 2) AS raw_total, decayed,
           |  round(decayed / raw_total, 6) AS freshness
           |FROM u
           |ORDER BY decayed DESC, user_id
           |LIMIT 15""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day"),
          Q.dec(col("value")).as("v"))
      val mx = ev.agg(max("day").cast("long").as("mxd"))
      val uk = ev.crossJoin(broadcast(mx))
        .groupBy(col("user_id"),
          expr("(mxd - day) div 7").cast("long").as("k"))
        .agg(sum("v").cast("decimal(38,2)").as("sk"))
      val u = uk.groupBy("user_id")
        .agg(sum("sk").cast("decimal(38,2)").cast("double").as("raw_total"),
          // Clamp the age bucket at 62: Java's shiftleft masks the count to
          // k & 63 (k=63 → negative weight) while DuckDB's << does not, so
          // an unclamped k ≥ 63 would silently diverge from the oracle on a
          // corpus spanning ≥ 63 weeks. At k = 62 the weight term is already
          // < 1e-9 of sk and rounds to 0 at 9 decimals — the clamp is
          // value-neutral, it only pins the two engines to the same formula.
          round(sum(round(col("sk").cast("double") /
            expr("shiftleft(CAST(1 AS BIGINT), CAST(LEAST(k, 62) AS INT))"), 9)
            .cast("decimal(28,9)")).cast("double"), 6).as("decayed"))
      u.select(col("user_id"), round(col("raw_total"), 2).as("raw_total"),
          col("decayed"),
          round(col("decayed") / col("raw_total"), 6).as("freshness"))
        .orderBy(col("decayed").desc, col("user_id"))
        .limit(15)
    })

  val all: Seq[Q] = Seq(q387_vshape_pattern, q396_page_hinkley,
    q402_funnel_window, q424_lb_keogh, q442_markov_attribution,
    q443_binary_segmentation, q445_entropy_rate, q446_decayed_engagement)
}
