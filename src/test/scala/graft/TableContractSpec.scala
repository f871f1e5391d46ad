package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** Schema contract for every driver-generated table, pinned against the REAL
  * testdata at all three scale factors — the generalization of
  * EventsVintageSpec's tripwire to the whole star schema. The round-8 red was
  * a silent generator dtype drift on ONE column of ONE table; this spec makes
  * the next drift, on any table, fail in-suite with a message naming the
  * column, instead of surfacing as a downstream analysis error in the driver.
  *
  * Deliberate contract notes:
  *   - `events.ts` is asserted POST-normalization (`TimestampType`) because
  *     [[Tables.events]] folds all physical vintages — that is the loader's
  *     promise to its consumers (`session_window`, watermarks, `unix_micros`).
  *   - `o_orderdate` / `l_shipdate` are asserted as the RAW parquet reading
  *     (`TimestampNTZType` under the current generator): their consumers are
  *     wall-clock functions (`date_format`, `year`, comparisons) that agree
  *     with DuckDB's naive reading, so no normalization layer exists to hide
  *     a drift — if the generator changes their physical type, this fails and
  *     the change gets handled deliberately.
  */
class TableContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private def loader(name: String): (SparkSession, String) => DataFrame =
    name match {
      case "region" => Tables.region case "nation" => Tables.nation
      case "customer" => Tables.customer case "supplier" => Tables.supplier
      case "part" => Tables.part case "orders" => Tables.orders
      case "lineitem" => Tables.lineitem case "events" => Tables.events
      case "documents" => Tables.documents
      case "embeddings" => Tables.embeddings
    }

  for (dir <- sfs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table schema contract holds at ${dir.split('/').last}") {
      val got = loader(table)(spark, dir).schema
        .map(f => (f.name, f.dataType match {
          // nullability / containsNull is not part of the contract
          case ArrayType(et, _) => ArrayType(et)
          case dt => dt
        }))
      assert(got == cols,
        s"$table at $dir drifted from the pinned contract:\n" +
          s"  got      $got\n  expected $cols")
    }
  }

  // sentenceTopicRows encodes a join elimination (drop lineitem⋈orders for
  // header-free consumers) whose correctness rests on referential integrity
  // of the generated corpus: every lineitem row must have a matching order
  // header. The election gate pins it transitively (one-scan ≡ two-pass);
  // this pins the projection identity DIRECTLY, so an RI break in a future
  // testdata vintage (orphan lineitems) names its root cause in-suite.
  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test("sentenceTopicRows equals the chunkRows projection at " +
        dir.split('/').last) {
      val pcols = Seq("sentence_id", "entity_name", "entity_sector",
        "entity_industry", "text")
      def canon(df: DataFrame): Array[String] =
        df.select(pcols.map(org.apache.spark.sql.functions.col): _*)
          .collect().map(_.toString).sorted
      val viaJoin = canon(Tables.chunkRows(spark, dir))
      val ordersFree = canon(Tables.sentenceTopicRows(spark, dir))
      assert(ordersFree.sameElements(viaJoin),
        "the orders-free sentence projection diverged from the joined " +
          s"relation at $dir — referential integrity no longer licenses " +
          "the join elimination")
    }
  }
}
