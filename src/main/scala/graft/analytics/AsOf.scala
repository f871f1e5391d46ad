package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.model.Tables

/** As-of join — an operator Spark's built-ins lack — composed from existing
  * ops (the preferred route before custom plans): probe and reference rows
  * are unioned into one stream, and a `last(ignoreNulls)` window over
  * (key, time) carries the latest reference value forward onto each probe
  * row. ONE shuffle on the key; no range join, no per-row lookup.
  *
  * Semantics here: for every lineitem (probe, at its ship date), the most
  * recent order (reference, by order date) placed by the same customer on or
  * before that ship date. Ties: reference rows sort before probes at the
  * same timestamp (as-of is ≤), and same-day orders resolve to the highest
  * order key.
  */
object AsOf {

  private val qAsofJoin = Q(
    "q_asof_join",
    (s, d) => {
      val c = Tables.chunkRowsPruned(s, d, withOrders = true)
      val probes = c.select(
        col("other_entity_id").as("cust"),
        col("l_shipdate").as("ts"),
        lit(1).as("is_probe"),
        lit(null).cast("long").as("ref_orderkey"),
        col("sentence_id"), col("entity_id"), col("part_entity_id"))
      val refs = Tables.orders(s, d).select(
        concat(lit("c"), col("o_custkey")).as("cust"),
        col("o_orderdate").as("ts"),
        lit(0).as("is_probe"),
        col("o_orderkey").as("ref_orderkey"),
        lit(null).cast("string").as("sentence_id"),
        lit(null).cast("string").as("entity_id"),
        lit(null).cast("string").as("part_entity_id"))
      val w = Window.partitionBy(col("cust"))
        .orderBy(col("ts"), col("is_probe"), col("ref_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionByName(refs)
        .withColumn("asof_orderkey",
          last(col("ref_orderkey"), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
          col("asof_orderkey"))
        .orderBy(col("sentence_id"), col("entity_id"), col("part_entity_id"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |probes AS (
         |  SELECT other_entity_id AS cust, l_shipdate AS ts, 1 AS is_probe,
         |         CAST(NULL AS BIGINT) AS ref_orderkey,
         |         sentence_id, entity_id, part_entity_id
         |  FROM chunk
         |),
         |refs AS (
         |  SELECT 'c' || CAST(o_custkey AS VARCHAR), o_orderdate, 0,
         |         o_orderkey, NULL, NULL, NULL
         |  FROM orders
         |),
         |merged AS (
         |  SELECT *, last_value(ref_orderkey IGNORE NULLS) OVER (
         |    PARTITION BY cust ORDER BY ts, is_probe, ref_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
         |  FROM (SELECT * FROM probes UNION ALL SELECT * FROM refs)
         |)
         |SELECT sentence_id, entity_id, part_entity_id, asof_orderkey
         |FROM merged WHERE is_probe = 1
         |ORDER BY sentence_id, entity_id, part_entity_id""".stripMargin))

  /** The SAME as-of semantics through the custom Catalyst operator
    * (`graft.plans.AsOfJoin` logical plan → strategy → sorted-merge
    * `SparkPlan`) — gated against the identical DuckDB oracle the composed
    * version uses, so the custom path is value-verified end-to-end. */
  private val qAsofPlan = Q(
    "q_asof_plan",
    (s, d) => {
      val probes = Tables.chunkRowsPruned(s, d, withOrders = true).select(
        col("other_entity_id").as("cust"),
        col("l_shipdate").as("ts"),
        col("sentence_id"), col("entity_id"), col("part_entity_id"))
      val refs = Tables.orders(s, d).select(
        concat(lit("c"), col("o_custkey")).as("rcust"),
        col("o_orderdate").as("rts"),
        col("o_orderkey").as("asof_orderkey"))
      graft.plans.AsOfJoinOps.asof(probes, refs,
        leftKey = "cust", rightKey = "rcust",
        leftTime = "ts", rightTime = "rts",
        rightTiebreak = Seq("asof_orderkey"))
        .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
          col("asof_orderkey"))
        .orderBy(col("sentence_id"), col("entity_id"), col("part_entity_id"))
    },
    qAsofJoin.oracle)

  def queries: Seq[Q] = Seq(qAsofJoin, qAsofPlan)
}
