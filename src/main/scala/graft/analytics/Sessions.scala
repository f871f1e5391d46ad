package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Gap-based sessionization and skew-safe aggregation — the two state/skew
  * patterns a 100 TB event pipeline leans on.
  */
object Sessions {

  /** Spark-native gap sessions (`session_window`, 30-minute gap) per user:
    * the engine merges events whose gap < 30 min into one window
    * [first event, last event + gap). The oracle reproduces the semantics
    * from first principles: lag/cumsum session ids over epoch-µs (an event
    * exactly AT last+gap starts a new session — window end is exclusive).
    * All values are integer µs — no float drift. */
  private val qSessionize = Q(
    "q_sessionize",
    (s, d) => Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us")),
    Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |),
        |g AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w >= 1800000000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |),
        |s AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
        |  FROM g
        |)
        |SELECT user_id, min(us) AS start_us,
        |       max(us) + 1800000000 AS end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, start_us""".stripMargin))

  /** Skew-safe two-phase aggregation: salt the grouping key, partial-count
    * per (key, salt), then re-aggregate per key. The oracle is the PLAIN
    * per-key count — semantic equivalence of the salted plan is exactly what
    * the gate asserts. At scale this is the fix for a hot key that
    * overwhelms a single reducer (salting bounds any partition's share of a
    * key to 1/16). */
  private val qSaltedAgg = Q(
    "q_salted_agg",
    (s, d) => Tables.chunkRowsPruned(s, d) // lineitem-only keys (RI prune)
      .withColumn("salt", pmod(crc32(col("sentence_id")), lit(16)))
      .groupBy(col("entity_id"), col("salt"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col("entity_id"))
      .agg(sum(col("partial_cnt")).cast("long").as("cnt"))
      .orderBy(col("entity_id")),
    Some(
      s"""WITH ${graft.Oracle.chunkCte}
         |SELECT entity_id, count(*) AS cnt
         |FROM chunk GROUP BY entity_id
         |ORDER BY entity_id""".stripMargin))

  def queries: Seq[Q] = Seq(qSessionize, qSaltedAgg)
}
