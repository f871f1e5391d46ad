package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Ev}

/** Multi-batch stateful sessionization: sessions close either when a later
  * event exceeds the gap or when event time moves past last+gap (timeout). */
class StatefulSessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // base away from epoch 0: an event at exactly the initial watermark (0)
  // is dropped as late (filter is ts > watermark)
  private val baseMs = 1704067200000L // 2024-01-01
  private val baseUs = baseMs * 1000L
  private def ts(min: Long): Timestamp = new Timestamp(baseMs + min * 60000L)

  test("gap and timeout both close sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val gapUs = 30L * 60 * 1000000 // 30 min
    val sessions = StatefulSessions.sessionize(input.toDS(), gapUs)
    val query = sessions.writeStream.format("memory")
      .queryName("closed_sessions").outputMode("append").start()
    try {
      // batch 1: two events 5 min apart → one open session
      input.addData(Ev(1L, ts(0)), Ev(1L, ts(5)))
      query.processAllAvailable()
      // batch 2: event 2 h later → gap-closes session 1, opens session 2;
      // also advances the watermark far past session 1's timeout
      input.addData(Ev(1L, ts(125)))
      query.processAllAvailable()
      // batch 3: another user keeps the stream moving → user 1's open
      // session times out on event time
      input.addData(Ev(2L, ts(300)))
      query.processAllAvailable()
      input.addData(Ev(2L, ts(400)))
      query.processAllAvailable()

      val got = spark.table("closed_sessions").as[ClosedSession].collect()
        .sortBy(s => (s.user_id, s.start_us))
      info("emitted: " + got.mkString("; "))
      assert(got.exists(s => s.user_id == 1 && s.start_us == baseUs &&
        s.n_events == 2 &&
        s.end_us == baseUs + (5 * 60 + 30 * 60) * 1000000L))
      assert(got.exists(s => s.user_id == 1 && s.n_events == 1 &&
        s.start_us == baseUs + 125L * 60 * 1000000))
    } finally query.stop()
  }

  test("stream sessionize over REAL events equals batch q_sessionize") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = "/root/testdata/sf0.001"
    val evs = graft.model.Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).as[Ev].collect()
    val maxMs = evs.map(_.ts.getTime).max
    val input = MemoryStream[Ev]
    val gapUs = 30L * 60 * 1000000L
    val sessions = StatefulSessions.sessionize(input.toDS(), gapUs)
    val query = sessions.writeStream.format("memory")
      .queryName("real_sessions").outputMode("append").start()
    try {
      input.addData(evs.toSeq)
      query.processAllAvailable()
      // sentinel user pushes the watermark a day past everything so every
      // real session times out and closes; two nudges so the timeout batch
      // definitely runs after the watermark advance
      input.addData(Ev(-1L, new Timestamp(maxMs + 86400000L)))
      query.processAllAvailable()
      input.addData(Ev(-1L, new Timestamp(maxMs + 2 * 86400000L)))
      query.processAllAvailable()

      val streamed = spark.table("real_sessions")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "start_us", "end_us", "n_events")
      val batch = SparkEntry.queries("q_sessionize")(spark, dir)
        .select("user_id", "start_us", "end_us", "n_events")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally query.stop()
  }
}
