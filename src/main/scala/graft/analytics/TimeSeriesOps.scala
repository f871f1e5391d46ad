package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.model.Tables

/** Window / time-series operators (SURVEY.md §2.7, W1-W9).
  *
  * All period buckets are rendered as strings (`yyyy-MM[-dd]`) — engine and
  * oracle agree exactly, independent of timestamp physical types. Weekly
  * buckets are ISO Monday-start (`date_trunc('week')` in both engines); the
  * reference's pandas `W-MON` (week *ending* Monday, `tool.py:627`) is the
  * shifted variant in [[wMon]].
  */
object TimeSeriesOps {

  /** pandas `to_period('W-MON')` analogue, DATE-typed: the Monday ENDING
    * the (Tue..Mon) week. d → next Monday, where a Monday labels itself.
    * ONE definition of the week arithmetic — the label form below, the
    * market pipeline's scaffold bounds, and its weekly count keys all
    * derive from it, so the convention cannot desynchronize between the
    * scaffold and the counts (which would zero-fill the whole panel). */
  private[analytics] def wMonDate(ts: Column): Column =
    date_add(date_trunc("week", ts - expr("INTERVAL 1 DAY")).cast("date"), 7)

  /** [[wMonDate]] rendered as the `yyyy-MM-dd` period label. */
  private[analytics] def wMon(ts: Column): Column =
    date_format(wMonDate(ts), "yyyy-MM-dd")

  /** W1: monthly chunk counts per sector. */
  private val qMonthly = Q(
    "q_period_buckets_month",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true,
      withSupplier = true)
      .groupBy(date_format(col("timestamp_utc"), "yyyy-MM").as("month"),
        col("entity_sector"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("month"), col("entity_sector")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT strftime(timestamp_utc, '%Y-%m') AS month, entity_sector,
         |       count(*) AS cnt
         |FROM chunk GROUP BY 1, 2 ORDER BY month, entity_sector""".stripMargin))

  /** W1 (W-MON variant, `Pricing_Power_Analysis/src/tool.py:617`): weekly
    * counts keyed by week-ending-Monday. */
  private val qWmon = Q(
    "q_wmon_weekly",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true)
      .groupBy(wMon(col("timestamp_utc")).as("week_end_mon"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("week_end_mon")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT strftime(date_trunc('week', timestamp_utc - INTERVAL 1 DAY)
         |                + INTERVAL 7 DAY, '%Y-%m-%d') AS week_end_mon,
         |       count(*) AS cnt
         |FROM chunk GROUP BY 1 ORDER BY week_end_mon""".stripMargin))

  /** W1/P9: quarterly distinct-document counts
    * (`Board_Management_Monitoring/src/tool.py:400`). */
  private val qQuarter = Q(
    "q_quarter_counts",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true)
      .groupBy(date_format(date_trunc("quarter", col("timestamp_utc")),
        "yyyy-MM-dd").as("quarter"))
      .agg(countDistinct(col("document_id")).as("n_docs"))
      .orderBy(col("quarter")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT strftime(date_trunc('quarter', timestamp_utc), '%Y-%m-%d') AS quarter,
         |       count(DISTINCT document_id) AS n_docs
         |FROM chunk GROUP BY 1 ORDER BY quarter""".stripMargin))

  /** W2: weekly resample of the events stream — count + sum per type.
    * `value` is cent-valued, so the sum is QUANTIZED (per-row round to
    * integer cents, exact long sum, divide back) exactly like q1_agg's
    * revenue: round(sum(double)) is shuffle-order-dependent and can flip
    * at a cent boundary between engines once groups get large. */
  private val qResample = Q(
    "q_resample_weekly",
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy(col("week"), col("event_type")),
    Some(
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
        |       count(*) AS cnt,
        |       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin))

  /** W3: z-score per series (`Narrative_Miners/src/tool.py:38-45`) — weekly
    * event counts normalized per event_type; zero-variance guard → 0. */
  private val qZscore = Q(
    "q_zscore_series",
    (s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
      weekly
        .withColumn("mu", avg(col("cnt")).over(w))
        .withColumn("sd", stddev_samp(col("cnt")).over(w))
        .withColumn("z",
          when(col("sd").isNull || col("sd") === 0.0, lit(0.0))
            .otherwise(round((col("cnt") - col("mu")) / col("sd"), 6)))
        .select(col("week"), col("event_type"), col("cnt"), col("z"))
        .orderBy(col("week"), col("event_type"))
    },
    Some(
      """WITH weekly AS (
        |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT week, event_type, cnt,
        |       CASE WHEN stddev_samp(cnt) OVER w IS NULL
        |              OR stddev_samp(cnt) OVER w = 0 THEN 0.0
        |            ELSE round((cnt - avg(cnt) OVER w)
        |                       / stddev_samp(cnt) OVER w, 6) END AS z
        |FROM weekly
        |WINDOW w AS (PARTITION BY event_type)
        |ORDER BY week, event_type""".stripMargin))

  /** W4: Gaussian-style smoothing as an explicit finite kernel [1,2,3,2,1]
    * renormalized at series edges (SURVEY.md §7.4 item 6) — lag/lead
    * dot-product, exactly expressible in SQL. */
  private val qSmooth = Q(
    "q_smooth_kernel",
    (s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      def tap(off: Int, weight: Double): (Column, Column) = {
        val v = off match {
          case 0 => col("cnt")
          case n if n < 0 => lag(col("cnt"), -n).over(w)
          case n => lead(col("cnt"), n).over(w)
        }
        (when(v.isNotNull, v * weight).otherwise(lit(0.0)),
          when(v.isNotNull, lit(weight)).otherwise(lit(0.0)))
      }
      val taps = Seq(-2 -> 1.0, -1 -> 2.0, 0 -> 3.0, 1 -> 2.0, 2 -> 1.0).map {
        case (o, wt) => tap(o, wt)
      }
      weekly
        .withColumn("smooth",
          round(taps.map(_._1).reduce(_ + _) / taps.map(_._2).reduce(_ + _), 6))
        .select(col("week"), col("event_type"), col("cnt"), col("smooth"))
        .orderBy(col("week"), col("event_type"))
    },
    Some(
      """WITH weekly AS (
        |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT week, event_type, cnt,
        |  round(
        |    (COALESCE(lag(cnt, 2) OVER w * 1.0, 0) + COALESCE(lag(cnt, 1) OVER w * 2.0, 0)
        |     + cnt * 3.0
        |     + COALESCE(lead(cnt, 1) OVER w * 2.0, 0) + COALESCE(lead(cnt, 2) OVER w * 1.0, 0))
        |    /
        |    (CASE WHEN lag(cnt, 2) OVER w IS NULL THEN 0 ELSE 1.0 END
        |     + CASE WHEN lag(cnt, 1) OVER w IS NULL THEN 0 ELSE 2.0 END
        |     + 3.0
        |     + CASE WHEN lead(cnt, 1) OVER w IS NULL THEN 0 ELSE 2.0 END
        |     + CASE WHEN lead(cnt, 2) OVER w IS NULL THEN 0 ELSE 1.0 END), 6) AS smooth
        |FROM weekly
        |WINDOW w AS (PARTITION BY event_type ORDER BY week)
        |ORDER BY week, event_type""".stripMargin))

  /** W8: dense period × entity scaffold with zero-fill (`tool.py:708-754`).
    * Months from sequence(min..max); the scaffold side is tiny relative to the
    * fact table, so the left join broadcasts the counts' dimension at scale.
    * Invariant under test: |rows| = |months| × |entities|. */
  /** The scaffold frame with the counts-cut A/B knob (round 18, VERDICT
    * item 4): `cut = true` lineage-cuts the (month, entity) counts
    * aggregate — a DIMENSION-BOUNDED frame — so its three consumers read
    * the materialization instead of each re-executing the pruned corpus
    * pass. Values identical either way (the cut is a materialization
    * boundary, not a semantic change); CutCrossoverProbe pins row equality
    * and measures the crossover per operating point. */
  private[graft] def scaffoldFrame(s: SparkSession, d: String,
      cut: Boolean): DataFrame = {
      // r17 (same values, same oracle): the month axis and the entity set
      // both derive from the counts aggregate — every chunk row lands in
      // some counts cell, so min/max month and the distinct entity set are
      // identical to computing them on the raw relation (the BoardPipeline
      // axis-from-counts pattern).
      // NOTE: the three consumers prune different columns, which
      // specializes the aggregate subtrees and disables ReusedExchange
      // (r17 plan dump) — each consumer re-executes the PRUNED corpus
      // pass. An explicit lineage cut was measured WORSE at sf0.1 (best
      // 1.33 s uncut vs 2.29 s cut, same session pair): checkpoint fixed
      // cost exceeds a pruned pass at gate scale. The relation is pruned
      // to the orders + supplier dims the query reads (join elimination
      // by RI).
      val counts0 =
        Tables.chunkRowsPruned(s, d, withOrders = true, withSupplier = true)
          .groupBy(date_format(col("timestamp_utc"), "yyyy-MM").as("month"),
            col("entity_name"))
          .agg(count(lit(1)).as("cnt"))
      val counts = if (cut) graft.PlanProbe.cut(counts0) else counts0
      val months = counts
        .agg(min(col("month")).as("mn"), max(col("month")).as("mx"))
        .select(explode(sequence(
          to_timestamp(col("mn"), "yyyy-MM"),
          to_timestamp(col("mx"), "yyyy-MM"),
          expr("INTERVAL 1 MONTH"))).as("m"))
        .select(date_format(col("m"), "yyyy-MM").as("month"))
      val entities = counts.select(col("entity_name")).distinct()
      months.crossJoin(entities)
        .join(counts, Seq("month", "entity_name"), "left")
        .na.fill(0, Seq("cnt"))
        .orderBy(col("month"), col("entity_name"))
  }

  private val qScaffold = Q(
    "q_scaffold_month_entity",
    // size-gated cut (r18): uncut at gate scale (the r17 measurement —
    // 1.33 s vs 2.29 s cut — and this round's sf0.1 wash), cut beyond the
    // measured ×10 crossover (3.60 → 2.73 s at ×10, 6.44 → 3.85 s at ×25;
    // CutCrossoverProbe, Tables.beyondCutCrossover).
    (s, d) => scaffoldFrame(s, d, cut = Tables.beyondCutCrossover(s, d)),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |bounds AS (
         |  SELECT date_trunc('month', min(timestamp_utc)) AS mn,
         |         date_trunc('month', max(timestamp_utc)) AS mx FROM chunk
         |),
         |months AS (
         |  SELECT strftime(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)), '%Y-%m') AS month
         |  FROM bounds
         |),
         |entities AS (SELECT DISTINCT entity_name FROM chunk),
         |counts AS (
         |  SELECT strftime(timestamp_utc, '%Y-%m') AS month, entity_name,
         |         count(*) AS cnt
         |  FROM chunk GROUP BY 1, 2
         |)
         |SELECT m.month, e.entity_name, COALESCE(c.cnt, 0) AS cnt
         |FROM months m CROSS JOIN entities e
         |LEFT JOIN counts c ON c.month = m.month AND c.entity_name = e.entity_name
         |ORDER BY m.month, e.entity_name""".stripMargin))

  /** W5/D5: index alignment + forward-fill + zero-fill
    * (`Narrative_Miners/src/tool.py:79-88`) over a dense day × event_type
    * scaffold: missing days inherit the last observed count, leading gaps → 0. */
  private val qFfill = Q(
    "q_index_align_ffill",
    (s, d) => {
      val e = Tables.events(s, d)
      val days = e
        .agg(date_trunc("day", min(col("ts"))).as("mn"),
          date_trunc("day", max(col("ts"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 DAY"))).as("dt"))
        .select(date_format(col("dt"), "yyyy-MM-dd").as("day"))
      val types = e.select(col("event_type")).distinct()
      val daily = e
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.crossJoin(types)
        .join(daily, Seq("day", "event_type"), "left")
        .withColumn("cnt_filled",
          coalesce(last(col("cnt"), ignoreNulls = true).over(w), lit(0L)))
        .select(col("day"), col("event_type"), col("cnt_filled"))
        .orderBy(col("day"), col("event_type"))
    },
    Some(
      """WITH bounds AS (
        |  SELECT date_trunc('day', min(ts)) AS mn, date_trunc('day', max(ts)) AS mx
        |  FROM events
        |),
        |days AS (
        |  SELECT strftime(unnest(generate_series(mn, mx, INTERVAL 1 DAY)), '%Y-%m-%d') AS day
        |  FROM bounds
        |),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |),
        |aligned AS (
        |  SELECT dy.day, t.event_type, da.cnt
        |  FROM days dy CROSS JOIN types t
        |  LEFT JOIN daily da ON da.day = dy.day AND da.event_type = t.event_type
        |)
        |SELECT day, event_type,
        |       COALESCE(last_value(cnt IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cnt_filled
        |FROM aligned
        |ORDER BY day, event_type""".stripMargin))

  /** W6: peak detection — top-3 peak days per event series. */
  private val qPeaks = Q(
    "q_peaks_topk",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("day").desc)
      daily.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .orderBy(col("event_type"), col("rk"))
    },
    Some(
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, day, cnt,
        |       CAST(row_number() OVER (PARTITION BY event_type
        |                               ORDER BY cnt DESC, day DESC) AS INT) AS rk
        |FROM daily
        |QUALIFY rk <= 3
        |ORDER BY event_type, rk""".stripMargin))

  /** W7/J11: peak lag — for each click peak, the nearest purchase peak by
    * absolute day distance; report the mean gap. The peak sets are tiny
    * (top-3 each) so the nearest-join is a broadcast cross join. */
  private val qPeakLag = Q(
    "q_peak_lag",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("day").desc)
      val peaks = daily.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
      val clicks = peaks.filter(col("event_type") === "click")
        .select(col("day").as("click_day"))
      val purchases = peaks.filter(col("event_type") === "purchase")
        .select(col("day").as("purchase_day"))
      clicks.crossJoin(broadcast(purchases))
        .withColumn("diff",
          abs(datediff(col("click_day").cast("date"),
            col("purchase_day").cast("date"))))
        .groupBy(col("click_day")).agg(min(col("diff")).as("nearest"))
        .agg(round(avg(col("nearest")), 4).as("avg_lag_days"))
    },
    Some(
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |),
        |peaks AS (
        |  SELECT event_type, day FROM daily
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |                             ORDER BY cnt DESC, day DESC) <= 3
        |),
        |nearest AS (
        |  SELECT c.day AS click_day,
        |         min(abs(date_diff('day', CAST(p.day AS DATE),
        |                           CAST(c.day AS DATE)))) AS nearest
        |  FROM peaks c CROSS JOIN peaks p
        |  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  GROUP BY c.day
        |)
        |SELECT round(avg(nearest), 4) AS avg_lag_days FROM nearest""".stripMargin))

  def queries: Seq[Q] = Seq(qMonthly, qWmon, qQuarter, qResample, qZscore,
    qSmooth, qScaffold, qFfill, qPeaks, qPeakLag)
}
