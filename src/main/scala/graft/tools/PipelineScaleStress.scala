package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Third-operating-point stress for the COMPOSED-LIFECYCLE gates — the
  * pipeline twin of [[ScaleStress]] (IVF family) and [[TextScaleStress]]
  * (shingle family). The release gate pins the seven end-to-end pipelines
  * (`q_market_pipeline`, `q_screener_pipeline`, `q_report_pipeline`,
  * `q_narrative_pipeline`, `q_election_pipeline`, `q_board_pipeline`,
  * `q_network_pipeline`) at sf0.01/sf0.1 with values
  * (DuckDB hash), identities (InvariantCheck), and AQE-final plan audits;
  * their 100×-scale claims rested on those sf0.1 plan audits plus design
  * notes. This tool manufactures a corpus `factor`× larger and re-pins
  * three things THERE, turning the scale argument into a measured curve:
  *
  *  - '''identities still hold''': the EXACT release-gate invariants
  *    ([[InvariantCheck.pipelineInvariants]] — z-sum, positive peaks,
  *    dedup cardinality, layout rescale — plus
  *    [[InvariantCheck.marketPanelRowsCheck]]'s panel reconciliation),
  *    evaluated on the blowup run's own result rows;
  *  - '''plans keep their shape''': CartesianProduct = 0, and every
  *    SortMergeJoin on the ADAPTIVE-FINAL executed plans
  *    ([[graft.PlanCheck.render]]) joins on a DESIGNED fact-fact key
  *    (orderkey / document_id) — including the pre-cut `labeledSearch`
  *    arms that the market/network lineage cuts would otherwise hide from
  *    a final-frame audit. This is the scale-honest form of the sf0.1
  *    audits' SMJ=0: at the base SF even the orders side fits the
  *    broadcast threshold, so NO join shuffles; at the blowup the
  *    fact-fact chunk join (`Tables.chunkRows`: "the only shuffle is the
  *    fact-fact equi-join") and board's doc-grain semi side MUST become
  *    shuffle joins — the regression this pin catches is a DIMENSION join
  *    or a dimension-bounded panel merge (suppkey/custkey/entity_name/
  *    week keys) degenerating to a shuffle at scale;
  *  - '''wall time stays ~linear''': each pipeline is timed at the source
  *    SF and at the blowup in the same session (warm JVM, best-of-2), and
  *    t_blowup ≤ t_base · factor · 3 — a quadratic candidate/join blowup
  *    lands at ~factor² and trips the bound immediately, while the 3×
  *    slack absorbs VM noise and per-stage constants.
  *
  * Blowup construction (pure function of (orderkey, copy) — no RNG,
  * bit-for-bit reproducible): the corpus FACTS replicate — copy k of
  * orders/lineitem remaps `o_orderkey → o_orderkey·factor + k` (copy 0 is
  * the source verbatim under the same remap) — while every dimension
  * (region/nation/customer/supplier/part/documents) ships verbatim. That
  * is the 100 TB shape: document volume grows `factor`×, the entity
  * universe, date range, and text corpus stay fixed, so scaffold
  * dimensions are constant and per-entity/per-week densities rise. Chunk
  * text assignment (`pmod(okey·7 + line, |docs|)`) lands each copy on a
  * different document, so labels and topics vary per copy instead of
  * shipping `factor` identical shards.
  *
  * Also measured (recorded, not gated): the ElectionPipeline S8 one-scan
  * knob ([[graft.analytics.ElectionPipeline.pipelineFrame]] `oneScan`) at
  * both operating points, with a driver-side row-equality pin against the
  * two-pass shape — the documented 100 TB trade (checkpoint the kept
  * slice vs scan twice) becomes a measurement instead of a note.
  *
  * {{{
  * spark-submit --master 'local[32]' --driver-memory 16g \
  *   --class graft.tools.PipelineScaleStress <jar> [srcDir] [factor] [outDir]
  * }}}
  */
object PipelineScaleStress {

  private val Dims =
    Seq("region", "nation", "customer", "supplier", "part", "documents")

  private val Pipelines = Seq("q_market_pipeline", "q_screener_pipeline",
    "q_report_pipeline", "q_narrative_pipeline", "q_election_pipeline",
    "q_board_pipeline", "q_network_pipeline")

  /** Deterministic fact blowup of `srcDir` into `outDir`: orders/lineitem
    * ×`factor` with the orderkey remap, dimensions verbatim. */
  def blowUpFacts(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    def copies(src: DataFrame, key: String): DataFrame =
      (0 until factor).map(k =>
        src.withColumn(key, col(key) * factor + k)).reduce(_ union _)
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    copies(orders, "o_orderkey")
      .repartition(col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")
    copies(lineitem, "l_orderkey")
      .repartition(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    Dims.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Best-of-2 wall time of a full collect+render run; returns the LAST
    * run's (rows, plan, schema) so identity/plan checks read what was
    * timed — re-building some pipelines just for `.schema` would re-pay
    * their eager construction stages (cuts, the layout collect). */
  private def timed(mk: => DataFrame)
      : (Double, Array[Row], String, org.apache.spark.sql.types.StructType) = {
    def once(): (Double, Array[Row], String,
        org.apache.spark.sql.types.StructType) = {
      val t0 = System.nanoTime()
      val df = mk
      val (rows, plan) = graft.PlanCheck.executedFinalPlan(df)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.PlanProbe.releaseCuts()
      (dt, rows, plan, df.schema)
    }
    val a = once(); val b = once()
    (math.min(a._1, b._1), b._2, b._3, b._4)
  }

  private def countNode(plan: String, node: String): Int =
    plan.linesIterator.count(_.trim.startsWith(node))

  /** SortMergeJoin lines whose join keys are NOT the designed fact-fact
    * keys. The chunk relation's lineitem⋈orders join and board's doc-grain
    * secondary-flag join are SUPPOSED to shuffle once the orders/doc side
    * outgrows the broadcast threshold (exactly what the blowup exercises);
    * a dimension join (suppkey/custkey/nationkey/…) or a dimension-bounded
    * panel merge (entity_name/week/…) appearing as a shuffle join is the
    * actual scale regression. The same physical join can render several
    * times through AQE stage-reuse paths — offenders are reported
    * distinct. */
  /** Per-pipeline additional allowed shuffle-join key shapes, each backed
    * by a design note at the join site. Election: the panel's daily merge
    * is DELIBERATELY un-hinted (ElectionPipeline stage-3 comment — "at a
    * scale where it no longer fits [the broadcast threshold], a shuffle
    * join on (entity, day) is the right plan"); at ×10 the sparse
    * (entity, day) aggregate legitimately crosses the threshold (more
    * observed cells toward its dense bound) and AQE picks exactly that
    * join. */
  private[graft] val AllowedSmj: Map[String, String => Boolean] = Map(
    "q_election_pipeline" ->
      (l => l.contains("entity_name") && l.contains("day")))

  private[graft] def offendingSmjKeys(plan: String,
      extraAllowed: String => Boolean = _ => false): Seq[String] =
    plan.linesIterator.map(_.trim).filter(_.startsWith("SortMergeJoin"))
      .filterNot(l => l.contains("orderkey") || l.contains("document_id") ||
        l.contains("doc_id") || extraAllowed(l))
      .toSeq.distinct

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outDir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipe_stress").toString)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    blowUpFacts(spark, srcDir, outDir, factor)
    val n = spark.read.parquet(s"$outDir/lineitem.parquet").count()
    val nBase = spark.read.parquet(s"$srcDir/lineitem.parquet").count()
    println(s"[pipestress] blowup ready: $srcDir ×$factor → $outDir " +
      s"(chunks $nBase → $n)")

    val qs = graft.SparkEntry.queries
    // JVM/codegen warm-up so the first timed base run isn't charged for it
    qs(Pipelines.head)(spark, srcDir).count()
    graft.PlanProbe.releaseCuts()

    val invByName = InvariantCheck.pipelineInvariants
      .map(i => i._1 -> i).toMap

    val failures = Pipelines.flatMap { name =>
      val (tBase, _, _, _) = timed(qs(name)(spark, srcDir))
      val (tBig, rows, plan, schema) = timed(qs(name)(spark, outDir))
      val smj = countNode(plan, "SortMergeJoin")
      val badSmj =
        offendingSmjKeys(plan, AllowedSmj.getOrElse(name, _ => false))
      val cart = countNode(plan, "CartesianProduct")
      val bound = tBase * factor * 3
      println(f"[pipestress] $name%-22s base=$tBase%7.2fs ×$factor=" +
        f"$tBig%7.2fs (bound ${bound}%.2f) rows=${rows.length} " +
        s"SMJ=$smj (off-key ${badSmj.size}) CART=$cart")
      // identities: re-assert the release gate's own invariant expression
      // over the timed run's rows (a local frame — no recompute)
      val invFail: Seq[String] = invByName.get(name).toSeq.flatMap {
        case (_, column, ok, desc) =>
          val local = spark.createDataFrame(
            new java.util.ArrayList[Row](
              scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
            schema)
          val v = local.selectExpr(column).head().get(0)
          if (ok(v)) { println(s"[pipestress] OK $name invariant: $desc"); Nil }
          else Seq(s"$name: $column = $v VIOLATES '$desc' at ×$factor")
      } ++ (name match {
        // the three gates whose identities live in driver-side row checks
        // rather than a self-verifying column — same sharing rule: the
        // blowup asserts EXACTLY what the release gate asserts
        case "q_market_pipeline" =>
          InvariantCheck.marketPanelRowsCheck(rows, "[pipestress]").toSeq
        case "q_screener_pipeline" =>
          InvariantCheck.screenerRowsCheck(rows, "[pipestress]").toSeq
        case "q_report_pipeline" =>
          InvariantCheck.reportRowsCheck(rows, "[pipestress]").toSeq
        case _ => Nil
      })
      val planFail =
        if (badSmj.isEmpty && cart == 0) Nil
        else Seq(s"$name: AQE-final plan at ×$factor has CART=$cart, " +
          s"off-fact-key shuffle joins:\n${badSmj.mkString("\n")}\n$plan")
      val timeFail =
        if (rows.isEmpty) Seq(s"$name: empty result at ×$factor")
        else if (tBig <= bound) Nil
        else Seq(f"$name: $tBig%.2fs at ×$factor exceeds ~linear bound " +
          f"$bound%.2fs (base $tBase%.2fs) — superlinear blowup")
      invFail ++ planFail ++ timeFail
    }

    // the lineage cuts hide the labeledSearch arms from the final-frame
    // audit above — audit both arms' executed plans directly at the blowup
    val armFailures = Seq(
      "labeledSearch(market)" ->
        (() => graft.analytics.MarketPipeline.labeledSearch(spark, outDir)),
      "labeledSearch(network)" ->
        (() => graft.analytics.MarketPipeline.labeledSearch(spark, outDir,
          graft.graph.NetworkPipeline.NetworkWatchlist))
    ).flatMap { case (label, mk) =>
      val (rows, plan) = graft.PlanCheck.executedFinalPlan(mk())
      graft.PlanProbe.releaseCuts()
      val smj = countNode(plan, "SortMergeJoin")
      val badSmj = offendingSmjKeys(plan)
      val cart = countNode(plan, "CartesianProduct")
      println(s"[pipestress] $label rows=${rows.length} SMJ=$smj " +
        s"(off-key ${badSmj.size}) CART=$cart")
      if (badSmj.isEmpty && cart == 0 && rows.nonEmpty) Nil
      else Seq(s"$label: rows=${rows.length} CART=$cart at ×$factor " +
        s"(expected nonempty, no cartesian, no off-fact-key shuffle " +
        s"joins):\n${badSmj.mkString("\n")}\n$plan")
    }

    // S8 shape A/B (recorded, not gated on time — ElectionCutProbe owns
    // the interleaved decision measurement): time BOTH pipelineFrame
    // shapes explicitly, whatever the registered default is, and PIN their
    // row equality at the blowup — the knob must never change values
    val electionKnobFailures: Seq[String] = {
      def sortKey(r: Row) = r.toSeq.map(String.valueOf).mkString("|")
      val E = graft.analytics.ElectionPipeline
      val (t2Base, _, _, _) =
        timed(E.pipelineFrame(spark, srcDir, oneScan = false))
      val (t2Big, twoRows, _, _) =
        timed(E.pipelineFrame(spark, outDir, oneScan = false))
      val (t1Base, _, _, _) =
        timed(E.pipelineFrame(spark, srcDir, oneScan = true))
      val (t1Big, oneRows, _, _) =
        timed(E.pipelineFrame(spark, outDir, oneScan = true))
      println(f"[pipestress] election S8 A/B: two-pass base=$t2Base%.2fs " +
        f"×$factor=$t2Big%.2fs; one-scan base=$t1Base%.2fs " +
        f"×$factor=$t1Big%.2fs")
      if (oneRows.map(sortKey).sorted.sameElements(
          twoRows.map(sortKey).sorted)) Nil
      else Seq(s"election one-scan knob changed VALUES at ×$factor " +
        s"(${oneRows.length} vs ${twoRows.length} rows)")
    }

    val allFailures = failures ++ armFailures ++ electionKnobFailures
    spark.stop()
    if (allFailures.nonEmpty) {
      allFailures.foreach(f => System.err.println(s"[pipestress] FAIL $f"))
      sys.exit(1)
    }
    println(s"[pipestress] all ${Pipelines.size} composed-lifecycle scale " +
      s"pins hold at ×$factor (n=$n chunks)")
  }
}
