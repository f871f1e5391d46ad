package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.sim.SimilarityOps

/** Persisted IVF index lifecycle: build-once/query-many with the inverted
  * lists laid out as hive partitions, so a probe is a partition-pruned scan.
  * Pins (1) search-result equality with the in-memory IVF path — same
  * arithmetic, same tiebreaks, bit-identical rows — and (2) the scale
  * property: a search's list scan reads only the probed bucket directories,
  * via dynamic partition pruning on the executed plan. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val indexDir = {
    val d0 = java.nio.file.Files.createTempDirectory("ivf_index").toString
    SimilarityOps.buildIvfIndex(spark, dir, d0)
    d0
  }

  override def afterAll(): Unit = spark.stop()

  /** Collect file scans through AQE wrappers — `AdaptiveSparkPlanExec` and
    * `QueryStageExec` hold their subplans outside `children`, so a plain
    * `collect` never reaches the scans of an adaptively-executed query. */
  private def fileScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }

  test("index layout: one inverted-list file per bucket directory") {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$indexDir/lists"))
    val byBucket =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
          .groupBy(_.getParent.getFileName.toString)
      } finally s.close()
    assert(byBucket.nonEmpty && byBucket.keys.forall(_.startsWith("bucket=")))
    assert(byBucket.values.forall(_.size == 1),
      s"inverted lists should be single-file: ${byBucket.view.mapValues(_.size).toMap}")
  }

  test("persisted-index search equals the in-memory IVF path bit-for-bit") {
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") % 100 === 0)
    val fromIndex = SimilarityOps.searchIvfIndex(spark, indexDir, queries,
      nprobe = 3, k = 5)
    val inMemory = SimilarityOps.ivfTopk(spark, dir, nprobe = 3, k = 5)
    assert(fromIndex.count() == inMemory.count())
    assert(fromIndex.exceptAll(inMemory).isEmpty &&
      inMemory.exceptAll(fromIndex).isEmpty)
  }

  test("a search's list scan is pruned to the probed buckets") {
    val one = Tables.embeddings(spark, dir).filter(col("vec_id") === 100)
    val res = SimilarityOps.searchIvfIndex(spark, indexDir, one,
      nprobe = 3, k = 5)
    assert(res.collect().length == 5)
    val listScans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata("Location").contains("lists"))
    assert(listScans.nonEmpty, "expected a scan over the lists zone")
    val scan = listScans.head
    assert(scan.partitionFilters.nonEmpty,
      s"probe join should dynamically prune the list scan:\n${res.queryExecution.executedPlan}")
    // one file per bucket (pinned above) → files read == buckets probed
    assert(scan.metrics("numFiles").value <= 3,
      s"expected <= nprobe files, got ${scan.metrics("numFiles").value}")
  }
}
