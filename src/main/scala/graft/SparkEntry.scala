package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.label.Labeler
import graft.model.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the market-analysis pipeline slice —
    * chunk rows → stub-label → keep P/A → monthly counts per entity →
    * top-5 entities per month. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = flagship(spark, "/root/testdata/sf0.001")

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    // reads timestamp (orders), entity_name (supplier) and label (text) —
    // the customer dim is eliminated by RI (Tables.chunkRowsPruned)
    val monthly = Labeler.withStubLabels(Tables.chunkRowsPruned(spark, dir,
      withOrders = true, withSupplier = true, withText = true))
      .filter(col("label").isin("P", "A"))
      .groupBy(date_format(col("timestamp_utc"), "yyyy-MM").as("month"),
        col("entity_name"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("month"))
      .orderBy(col("cnt").desc, col("entity_name"))
    monthly.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("month"), col("rk"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
