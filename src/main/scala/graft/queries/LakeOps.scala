package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Lakehouse maintenance, part 2: snapshot differencing (the inverse of
  * the q63 CDC merge) and SCD2 interval construction from a change
  * history — both oracle-checked.
  */
object LakeOps {

  /** Snapshot diff (operators/SnapshotDiff): old = the customer table;
    * new = a deterministic mutation of it (delete keys ≡0 mod 97, +10.00
    * balance for keys ≡0 mod 5, and one synthetic inserted key per
    * thousand). The feed out is exactly the I/U/D rows; unchanged rows
    * never appear. One full-outer join on the key. */
  val q85_snapshot_diff = Q(
    "q85_snapshot_diff",
    Some("""WITH old AS (
            |  SELECT c_custkey AS id, c_name AS name,
            |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
            |  FROM customer),
            |new AS (
            |  SELECT id, name,
            |    CASE WHEN id % 5 = 0 THEN bal + CAST(10 AS DECIMAL(18,2))
            |         ELSE bal END AS bal
            |  FROM old WHERE id % 97 <> 0
            |  UNION ALL
            |  SELECT id * 1000000 + 7, 'synthetic_' || CAST(id AS VARCHAR),
            |    CAST(1 AS DECIMAL(18,2))
            |  FROM old WHERE id % 1000 = 0)
            |SELECT coalesce(n.id, o.id) AS id,
            |  CASE WHEN n.id IS NULL THEN o.name ELSE n.name END AS name,
            |  CAST(CASE WHEN n.id IS NULL THEN o.bal ELSE n.bal END AS DOUBLE) AS bal,
            |  CASE WHEN n.id IS NULL THEN 'D'
            |       WHEN o.id IS NULL THEN 'I'
            |       WHEN o.name <> n.name OR o.bal <> n.bal THEN 'U' END AS op
            |FROM old o FULL OUTER JOIN new n ON o.id = n.id
            |WHERE (CASE WHEN n.id IS NULL THEN 'D'
            |            WHEN o.id IS NULL THEN 'I'
            |            WHEN o.name <> n.name OR o.bal <> n.bal THEN 'U' END)
            |      IS NOT NULL
            |ORDER BY id, op""".stripMargin),
    (s, d) => {
      val old = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val neu = old.filter(col("id") % 97 =!= 0)
        .withColumn("bal",
          when(col("id") % 5 === 0, col("bal") + lit(10).cast("decimal(18,2)"))
            .otherwise(col("bal"))
            .cast("decimal(18,2)")) // decimal + widens; restore the schema
        .unionByName(old.filter(col("id") % 1000 === 0).select(
          (col("id") * 1000000 + 7).as("id"),
          concat(lit("synthetic_"), col("id").cast("string")).as("name"),
          lit(1).cast("decimal(18,2)").as("bal")))
      graft.operators.SnapshotDiff.diff(old, neu, "id")
        .select(col("id"), col("name"), col("bal").cast("double").as("bal"),
          col("op"))
        .orderBy("id", "op")
    })

  /** SCD2 interval build: a keyed change history (events as versions of a
    * per-user attribute) becomes validity intervals —
    * [valid_from, valid_to) with a null-open current row — via one lead()
    * window per key. THE slowly-changing-dimension constructor; one
    * shuffle on the key. */
  val q86_scd2_intervals = Q(
    "q86_scd2_intervals",
    Some("""WITH v AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS vfrom,
            |    event_id, value
            |  FROM events WHERE event_type = 'purchase')
            |SELECT user_id, vfrom,
            |  lead(vfrom) OVER w AS vto,
            |  (lead(vfrom) OVER w IS NULL) AS is_current,
            |  event_id, value
            |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY vfrom, event_id)
            |ORDER BY user_id, vfrom, event_id""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("vfrom", "event_id")
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("vfrom"),
          col("event_id"), col("value"))
        .withColumn("vto", lead(col("vfrom"), 1).over(w))
        .withColumn("is_current", col("vto").isNull)
        .select("user_id", "vfrom", "vto", "is_current", "event_id", "value")
        .orderBy("user_id", "vfrom", "event_id")
    })

  val all: Seq[Q] = Seq(q85_snapshot_diff, q86_scd2_intervals)
}
