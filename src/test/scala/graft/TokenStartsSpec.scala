package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** Property test for [[Tables.tokenStarts]] — the split-fold occurrence
  * enumerator feeding the entities array, both mask gates, and the
  * other_entities projection. Compared against an independent reference:
  * `String.indexOf` non-overlapping scan (the reference's `finditer`
  * semantics).
  *
  * SCOPE: generators are ASCII-only, deliberately — the oracle measures
  * UTF-16 code units (java.lang.String) while tokenStarts measures code
  * points (Spark `length`), and the two units coincide only on BMP text.
  * The corpus contract is ASCII (see the tokenStarts Scaladoc's offset-unit
  * note); this spec certifies the enumeration on that contract, not a
  * unicode-offset equivalence. */
class TokenStartsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reference: non-overlapping left-to-right scan. */
  private def refStarts(text: String, token: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = text.indexOf(token)
    while (i >= 0) { out += i; i = text.indexOf(token, i + token.length) }
    out.toSeq
  }

  private def sparkStarts(texts: Seq[String], token: String): Seq[Seq[Int]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(Tables.tokenStarts(col("text"), token).as("starts"))
      .collect().toSeq.map(_.getSeq[Int](0))
  }

  test("property: split-fold enumeration equals the indexOf scan") {
    // corpora built from a tiny alphabet plus the token itself, so
    // occurrences are dense and adjacent ("partpart"), leading, and trailing
    val token = "part"
    val pieceGen = Gen.oneOf("part", "p", "a", "r", "t", "x", " ", "pa", "par")
    val textGen = Gen.listOf(pieceGen).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(30, textGen)) { texts =>
      sparkStarts(texts, token) == texts.map(refStarts(_, token))
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("edge cases: empty, token-only, leading, trailing, no match") {
    val token = "order"
    val texts = Seq("", "order", "orderX", "Xorder", "oorderr",
      "orderorder", "ordeorder", "no match here", "ord")
    assert(sparkStarts(texts, token) == texts.map(refStarts(_, token)))
  }

  test("all three planted tokens cannot self-overlap (split == full scan)") {
    // the non-overlapping enumeration equals the every-position scan exactly
    // when no token has a proper border (prefix == suffix); verify that
    // property for the tokens the corpus plants
    for (t <- Seq("customer", "part", "order"); k <- 1 until t.length)
      assert(!(t.take(k) == t.takeRight(k)),
        s"token '$t' has a border of length $k — overlapping occurrences " +
          "would diverge from split enumeration")
  }
}
