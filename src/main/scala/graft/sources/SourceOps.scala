package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.{Tables, ThemeTree}

/** Source-side operators: knowledge-graph entity enrichment (S3/S4), the
  * taxonomy label→parent rollup (J10), and the stage-checkpoint cache (S8).
  */
object SourceOps {

  /** S8: pickle-cache analogue (`report_generator.py:142-187`) — write-once /
    * read-back parquet checkpoint keyed by stage name. */
  def cached(spark: SparkSession, checkpointDir: String, stage: String)
      (rebuild: => DataFrame): DataFrame = {
    val path = s"$checkpointDir/$stage"
    // Existence probe via the Hadoop FileSystem API — resolves against
    // whatever FS the path's scheme names (HDFS/S3A/local), not just the
    // driver's local disk like a java.io.File probe would.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a bare directory is NOT a valid checkpoint: a rebuild killed mid-write
    // (preemption, OOM) leaves part-files but no _SUCCESS commit marker, and
    // trusting it would silently serve truncated data to every downstream
    // stage. Only a committed write counts; anything else is torn down and
    // rebuilt (mode=overwrite would clear it anyway — the delete just makes
    // the stale state impossible to observe between the branches).
    val committed = committedDir(fs, hPath)
    if (committed) spark.read.parquet(path)
    else {
      if (fs.exists(hPath)) fs.delete(hPath, true)
      val df = rebuild
      df.write.mode("overwrite").parquet(path)
      markCommitted(fs, hPath)
      spark.read.parquet(path)
    }
  }

  /** Publish graft's own job-level commit marker after a successful write.
    * Exists for deployments that disable Hadoop's `_SUCCESS` markers: there
    * a task-committed part-file is visible BEFORE the job commits (v2
    * committers publish per task), so part-file presence cannot stand in
    * for a committed JOB — this sidecar, written after `df.write` returns,
    * can. */
  private[graft] def markCommitted(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit =
    fs.create(new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMITTED"), true)
      .close()

  /** True iff `dir` holds a COMMITTED parquet write: Hadoop's `_SUCCESS`
    * job marker, or graft's own `_GRAFT_COMMITTED` sidecar (written by
    * [[markCommitted]] for deployments that disable success markers via
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false`). Part-file
    * presence deliberately does NOT count: v2 committers publish
    * part-files at TASK commit, so a job killed after some tasks committed
    * leaves visible part-files of a torn write — trusting them would
    * silently serve truncated data to every downstream stage. A marker-off
    * checkpoint written before the sidecar existed rebuilds once and is
    * marked from then on. */
  private[graft] def committedDir(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")) ||
      fs.exists(new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMITTED"))

  /** Bucketed table writer — the co-located-join path for the fact-fact
    * edges that stay shuffle joins at 100 TB (README "Shuffle inventory":
    * lineitem⋈orders on the order key is the one scaling exchange in the
    * chunk star join). Writing both sides `bucketBy(n, key).sortBy(key)`
    * makes every later equi-join on that key EXCHANGE-FREE: the scans come
    * up hash-partitioned and sorted, so the sort-merge join starts
    * immediately — the shuffle is paid once at write time and amortized over
    * every downstream query. Bucket count is a layout decision: pick so one
    * bucket of the bigger table fits an executor's memory at target SF.
    * The exchange elision is automatic; eliding the per-partition SORT as
    * well additionally needs `spark.sql.legacy.bucketedTableScan
    * .outputOrdering=true`, which is safe exactly because this writer
    * guarantees single-file buckets (BucketedJoinSpec pins both
    * properties). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column form of [[writeBucketed]] for joins keyed on a COMPOSITE
    * key (e.g. the MinHash band table's (band, key)). Bucket on the FULL
    * join key: Spark's default co-partition check
    * (`spark.sql.requireAllClusterKeysForCoPartition`) only reuses a
    * table's hash layout when the bucket columns cover every join key — a
    * subset-key layout shuffles BOTH sides again (observed; pinned in
    * StreamingCorpusSpec). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucket column")
    // repartition on the keys into exactly `buckets` partitions first: the
    // repartition hash and the bucket hash are the same Murmur3, so each
    // write task holds exactly one bucket → ONE file per bucket. Spark only
    // trusts the sortBy order at read time when buckets are single-file
    // (multi-file buckets get re-sorted), so this is what makes downstream
    // merges sort-free as well as exchange-free.
    df.repartition(buckets, keys.map(df.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-partitioned landing-layout writer — the sibling of
    * [[writeBucketed]] for the OTHER 100 TB layout decision: a corpus landed
    * as `dir/col=value/` directories gets partition PRUNING on every
    * downstream read (a filter on the partition column skips whole
    * directories at file-listing time — `PartitionFilters` in the scan, zero
    * I/O for excluded partitions), which is what makes "last day's events"
    * or "one source's documents" cheap against a 100 TB landing zone.
    *
    * The naive `df.write.partitionBy(c)` has a small-files pathology at
    * scale: every write TASK emits one file per partition value it holds, so
    * T tasks × P values → up to T·P files. Repartitioning by the partition
    * columns first routes each value to exactly one task → exactly one file
    * per partition; `filesPerPartition > 1` salts that hash so a hot
    * partition (skewed source/day) splits into a bounded number of files and
    * doesn't bottleneck on one writer task. PartitionedLayoutSpec pins file
    * counts, pruning, and the overwrite semantics below. */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    require(!df.columns.contains("__slice"),
      "__slice is reserved by writePartitioned's salting — rename the " +
        "input column (withColumn would silently clobber it)")
    val keys = partitionCols.map(df.col)
    val routed =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else {
        // xxhash64 over the row struct: same uniform slice distribution as
        // the previous crc32(to_json(...)) at a fraction of the cost — no
        // per-row JSON serialization — and it works on column types
        // to_json cannot render
        val salted = df.withColumn("__slice",
          pmod(xxhash64(struct(df.columns.map(col): _*)),
            lit(filesPerPartition.toLong)))
        // explicit partition count: a bare repartition(cols) is an AQE
        // coalesce target, and coalescing merges slices of one partition
        // value back into one task — silently defeating the salt (observed:
        // a tiny write coalesced to a single task → one file per value)
        val n = df.sparkSession.sessionState.conf.numShufflePartitions
        salted.repartition(n, keys :+ salted.col("__slice"): _*).drop("__slice")
      }
    routed.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(dir)
  }

  /** Idempotent partition backfill: overwrite ONLY the partitions present in
    * `df`, leaving every other partition of the layout untouched (dynamic
    * partition-overwrite; the per-write option avoids flipping the session
    * default). This is the production re-run primitive — recompute one
    * day/source and land it atomically without clobbering the rest, so a
    * failed-and-retried backfill converges instead of destroying data. The
    * default static overwrite mode would drop ALL partitions first. */
  def overwritePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(dir)

  /** Partition compaction — the maintenance pass that follows streaming
    * landing: each micro-batch appends small files, so a long-running stream
    * accumulates file counts that degrade listing and scan startup at scale.
    * Read ONLY the partitions matching `predicate` (the read prunes, so
    * compaction cost is proportional to the data compacted, not the zone),
    * then re-land them through [[overwritePartitions]] — one file per
    * partition, siblings untouched, and the overwrite is atomic per
    * partition so readers never see a half-compacted one. Run it on closed
    * partitions (yesterday's date=, a finished source=).
    *
    * Two deliberate mechanics: (1) the slice is materialized via
    * `localCheckpoint` before the write — Spark (correctly) refuses a lazy
    * plan that overwrites its own input path, and the checkpoint bounds the
    * in-flight state to the partitions being compacted; (2) this applies to
    * BATCH-written layouts ([[writePartitioned]]) — a STREAM-landed zone
    * ([[graft.streaming.EventStream.landPartitioned]]) is read through its
    * `_spark_metadata` manifest, which a batch rewrite would go stale
    * against; retire the manifest (stop the stream, move/remove
    * `_spark_metadata`) before compacting such a zone.
    *
    * `dedupKeys` (optional) also collapses duplicate rows by key while
    * compacting — the reclamation half of at-least-once append ingestion
    * (e.g. a retried index append landing a vector twice;
    * [[graft.streaming.EmbeddingStream]]): the zone comes out both
    * one-file-per-partition AND exactly-once. Keeper among duplicates is
    * arbitrary, which is only sound when duplicates are full-row identical
    * (true for append retries of deterministic rows) — ENFORCED below: a
    * caller whose key collides across DIFFERENT rows (say a re-embedded
    * vec_id) fails loudly instead of keeping a nondeterministic row. The
    * check is one extra aggregation over the slice being compacted — cost
    * proportional to the compaction itself, the right price for turning
    * silent nondeterminism into a named error on a maintenance pass. */
  def compactPartitions(spark: SparkSession, dir: String,
      partitionCols: Seq[String],
      predicate: org.apache.spark.sql.Column,
      dedupKeys: Seq[String] = Nil): Unit = {
    require(!new org.apache.hadoop.fs.Path(dir, "_spark_metadata")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(dir, "_spark_metadata")),
      s"$dir is a streaming file-sink zone (_spark_metadata present): " +
        "batch compaction would go stale against the manifest — retire it first")
    // Pin partition-type inference OFF for the maintenance read: inference
    // NORMALIZES directory values (string "00123" → int 123, ISO strings →
    // dates), and re-landing a normalized value writes a DIFFERENTLY-NAMED
    // directory while dynamic overwrite clears only the partitions being
    // written — the original dir would survive and every row in it would be
    // served twice. With inference off the partition column round-trips as
    // the exact directory text; downstream readers re-infer as before
    // (parquet partition columns live in directory names, not files).
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferPrev = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      val slice0 = spark.read.parquet(dir).filter(predicate)
      val slice = (if (dedupKeys.nonEmpty) {
        val conflicted = slice0
          .groupBy(dedupKeys.map(slice0.col): _*)
          .agg(countDistinct(struct(slice0.columns.map(slice0.col): _*))
            .as("__variants"))
          .filter(col("__variants") > 1).limit(1).count()
        require(conflicted == 0L,
          s"dedupKeys ${dedupKeys.mkString(",")} collide across non-identical " +
            "rows — an arbitrary keeper would be nondeterministic; resolve the " +
            "conflict upstream (dedup here only reclaims exact append retries)")
        slice0.dropDuplicates(dedupKeys)
      } else slice0).localCheckpoint()
      overwritePartitions(slice, dir, partitionCols)
    } finally spark.conf.set(inferKey, inferPrev)
  }

  /** Sort-clustered layout writer — the THIRD 100 TB layout lever, next to
    * [[writeBucketed]] (exchange-free co-located joins) and
    * [[writePartitioned]] (directory pruning): range-route the rows across
    * `files` output files and sort each file on the cluster key, so
    * parquet's per-row-group min/max statistics become SELECTIVE. A
    * downstream filter on the cluster key then reads only the row
    * groups/pages whose stat range intersects the predicate (the reader
    * skips the rest after footer checks) — data skipping WITHOUT a
    * directory per value, which is the right tool for HIGH-CARDINALITY keys
    * (user ids, URLs, second-grained timestamps) where `partitionBy` would
    * explode into millions of tiny directories and `bucketBy` only helps
    * joins, not range/point predicates. On an unclustered layout every file
    * spans the full key range, so min/max stats exclude nothing and a point
    * query reads the corpus.
    *
    * The range exchange is paid ONCE at write time (same amortization
    * argument as the bucketed layout); `files` is a layout decision — size
    * so one file is a few hundred MB at target SF. ClusteredLayoutSpec pins
    * the skipping on executed-scan metrics, not intent. */
  def writeClustered(df: DataFrame, dir: String, clusterCols: Seq[String],
      files: Int): Unit = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    require(files >= 1, "files must be >= 1")
    val keys = clusterCols.map(df.col)
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** S6/S7 (lightweight form): tabular sheet sink/source as header'd CSV per
    * sheet — the plain-text sibling of the BINARY workbook path, which is
    * [[Xlsx.saveWorkbook]]/[[Xlsx.readWorkbook]] (real multi-sheet `.xlsx`
    * round-trip on JDK zip+XML alone; that module carries the reference
    * contract citations). Dates are rendered as ISO strings on write so the
    * round-trip is type-stable in both forms. */
  def writeSheet(df: DataFrame, dir: String, sheet: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/$sheet")

  def readSheet(spark: SparkSession, dir: String, sheet: String): DataFrame =
    // multiLine: a quoted text field containing a newline is ONE record —
    // the default line-based split shears it into two malformed rows, so
    // even this module's own writeSheet → readSheet round-trip would break
    // on any text column carrying a newline
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("multiLine", "true").csv(s"$dir/$sheet")

  /** One per-JVM temp dir for [[readWorkbookSheet]] slices, registered for
    * exit-deletion ONCE — per-read dirs grew the deleteOnExit set (and the
    * disk) monotonically in a long-lived driver doing repeated reads. */
  private lazy val sheetTmpDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_sheet")
    d.toFile.deleteOnExit()
    d
  }

  /** [[sheetTmpDir]], re-created if an external tmp cleaner reaped it: a
    * cleaner deletes aged DIRECTORIES, not just files, so every write into
    * the per-JVM dir must re-ensure the dir itself or the recovery path
    * dies on NoSuchFileException instead of recovering.
    * createDirectories is idempotent. */
  private def ensuredSheetTmpDir: java.nio.file.Path =
    java.nio.file.Files.createDirectories(sheetTmpDir)

  /** Body-slice cache for [[readWorkbookSheet]], keyed by content digest:
    * one backing file (and one deleteOnExit registration) per DISTINCT
    * body, however many times the sheet is re-read. */
  private val sheetBodyCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** S7 with the reference's workbook-loading quirks
    * (`Narrative_Miners/src/tool.py:10-26`): real result sheets carry a
    * banner row above the header (pandas `header=1`) and spreadsheet index
    * columns that arrive named `Unnamed: N`. This reader skips the banner,
    * takes line 1 as the header, drops Unnamed/blank columns, parses `Date`,
    * and stamps `Source_Type` — the full load_results contract.
    *
    * Records are split by the CSV grammar, NOT by physical lines: a
    * quoted field containing a newline is one record, where a text-line
    * index sheared it in two and shifted the banner/header offsets for
    * everything after. The banner/header/body boundaries come from a
    * quote-aware driver-side scan of the raw file (a whole-file
    * spark.read can't serve here: CSV schema width pins to the FIRST
    * record — the one-field banner); the header and body slices then go
    * through Spark's own multiLine CSV parser, so fields, quoting, and
    * the body's column types are all real-parser semantics. Sheets are
    * small presentation tables, so this bounded driver pass is a
    * driver-adjacent source, not a 100 TB path. */
  def readWorkbookSheet(spark: SparkSession, path: String,
      sourceType: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = {
      val in = fs.open(p)
      val buf = new java.io.ByteArrayOutputStream()
      try {
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      } finally in.close()
      buf.toString("UTF-8")
    }
    // end index of the CSV record starting at `from`: newlines inside
    // quotes don't terminate (doubled quotes toggle twice — a no-op, which
    // is exactly right for the "" escape)
    def recordEnd(from: Int): Int = {
      var i = from; var inQ = false
      while (i < raw.length) {
        val ch = raw.charAt(i)
        if (ch == '"') inQ = !inQ
        else if (ch == '\n' && !inQ) return i
        i += 1
      }
      raw.length
    }
    val e0 = recordEnd(0)
    require(e0 < raw.length, s"no header line in $path")
    val e1 = recordEnd(e0 + 1)
    // the header goes through the SAME CSV parser as the body — a naive
    // split(",") would shear a quoted header containing a comma
    // (`"Revenue, Net"`) into two names and misalign every column after it.
    // The header slice is fully consumed by .head() so it is deleted
    // eagerly (unique name: concurrent reads share sheetTmpDir)
    val headerFile = java.nio.file.Files.createTempFile(
      ensuredSheetTmpDir, "header", ".csv")
    java.nio.file.Files.writeString(headerFile,
      raw.substring(e0 + 1, e1).stripSuffix("\r"))
    val names =
      try spark.read.option("multiLine", "true").csv(headerFile.toString)
        .head().toSeq.map(v => if (v == null) "" else v.toString.trim)
      finally java.nio.file.Files.deleteIfExists(headerFile)
    val bodyTxt = if (e1 >= raw.length) "" else raw.substring(e1 + 1)
    // body slices back the returned (lazy) DataFrame, so they can only be
    // reclaimed at JVM exit — cache them by CONTENT digest (r13 advice):
    // repeated reads of the same sheet reuse one backing file instead of
    // growing the deleteOnExit set and the on-disk litter per read, while
    // a workbook that changed on disk gets a fresh file and frames from
    // earlier reads keep their still-valid backing (no overwrite race)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bodyTxt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // compute(), not computeIfAbsent(): a hit must revalidate that the
    // backing file still EXISTS — in a long-lived driver an external tmp
    // cleaner (systemd-tmpfiles etc.) can reap /tmp under the JVM, and a
    // stale cache entry would hand out a DataFrame over a missing file
    // that fails at action time with an opaque FileNotFoundException.
    // Recreating at the same digest-keyed path is idempotent and safe:
    // the content is identical by construction of the key.
    val bodyFile = sheetBodyCache.compute(digest, (_, cached) =>
      if (cached != null && java.nio.file.Files.exists(cached)) cached
      else {
        val f = ensuredSheetTmpDir.resolve(s"body-$digest.csv")
        java.nio.file.Files.writeString(f, bodyTxt)
        f.toFile.deleteOnExit()
        f
      })
    val parsed = spark.read.option("inferSchema", "true")
      .option("multiLine", "true").csv(bodyFile.toString)
    val kept = names.zipWithIndex.filter { case (n, _) =>
      n.nonEmpty && !n.startsWith("Unnamed:") }
    val named = parsed.select(kept.toSeq.map { case (n, i) => col(s"_c$i").as(n) }: _*)
    val dated =
      if (named.columns.contains("Date"))
        named.withColumn("Date", to_date(col("Date")))
      else named
    dated.withColumn("Source_Type", lit(sourceType))
  }

  /** S3/S4: typed knowledge-graph enrichment — every entity reference in the
    * chunk table joined against the entity dimension (suppliers + customers +
    * parts with sector/industry_group), counted by type and industry group.
    * The dimension side is orders of magnitude smaller than the fact side at
    * every SF; Catalyst broadcasts it on stats (no forced hint — see
    * Tables.chunkRows note). */
  private val qEntityEnrich = Q(
    "q_entity_enrich",
    (s, d) => {
      val ids = Tables.chunkRowsPruned(s, d, withOrders = true)
        .select(explode(array(col("entity_id"), col("other_entity_id"),
          col("part_entity_id"))).as("entity_id"))
      ids.join(Tables.entityDim(s, d), Seq("entity_id"))
        .groupBy(col("entity_type"), col("industry_group"))
        .agg(count(lit(1)).as("n_refs"),
          countDistinct(col("entity_id")).as("n_entities"))
        .orderBy(col("entity_type"), col("industry_group"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${Oracle.entityDimCte},
         |ids AS (
         |  SELECT entity_id FROM chunk
         |  UNION ALL SELECT other_entity_id FROM chunk
         |  UNION ALL SELECT part_entity_id FROM chunk
         |)
         |SELECT e.entity_type, e.industry_group, count(*) AS n_refs,
         |       count(DISTINCT i.entity_id) AS n_entities
         |FROM ids i JOIN entity_dim e ON i.entity_id = e.entity_id
         |GROUP BY 1, 2
         |ORDER BY entity_type, industry_group""".stripMargin))

  /** J10: label → parent-theme rollup through the flattened taxonomy tree
    * (broadcast tree join; reference does a driver-side dict .map —
    * `labels.py:448-476`). */
  private val qThemeRollup = Q(
    "q_theme_rollup",
    (s, d) => {
      val flat = ThemeTree.flatDf(s)
      val leaves = flat.filter(col("is_leaf"))
        .select(col("label"), col("parent_id"))
      val parents = flat.select(col("node_id"), col("label").as("theme"))
      Labeler.withStubLabels(Tables.chunkRowsPruned(s, d, withText = true))
        .join(broadcast(leaves), Seq("label"))
        .join(broadcast(parents), col("parent_id") === col("node_id"))
        .groupBy(col("theme"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("entity_id")).as("n_entities"))
        .orderBy(col("theme"))
    },
    Some(
      s"""${Oracle.labeledCte}
         |SELECT par.theme, count(*) AS n_chunks,
         |       count(DISTINCT labeled.entity_id) AS n_entities
         |FROM labeled
         |JOIN (VALUES ('P', 2), ('A', 2), ('N', 3), ('U', 3))
         |  AS leaf(label, parent_id) ON labeled.label = leaf.label
         |JOIN (VALUES (2, 'adoption'), (3, 'risk'))
         |  AS par(node_id, theme) ON leaf.parent_id = par.node_id
         |GROUP BY par.theme
         |ORDER BY par.theme""".stripMargin))

  /** L3 gate: the taxonomy generator's full loop — render the fixture tree
    * to the reference's JSON shape, wrap it in the markdown fences an LLM
    * response arrives in, run the scrub+parse path (with its brace-substring
    * fallback armed), and flatten the parsed tree. The oracle pins every
    * flattened row AND a `parse_roundtrip_ok` flag asserting the parsed tree
    * (and keywords) equals the original — a parse regression fails the gate
    * rather than silently flattening the fixture. */
  private val qThemeTree = Q(
    "q_theme_tree",
    (s, d) => {
      val keywords = Seq("efficiency", "cost")
      val fenced =
        "```json\n" + ThemeTree.toJson(ThemeTree.fixture, keywords) + "\n```"
      val parsed = ThemeTree.parseThemeTree(fenced)
      val ok = parsed == Right((ThemeTree.fixture, keywords))
      ThemeTree.flatDf(s, parsed.map(_._1).getOrElse(ThemeTree.fixture))
        .select(col("node_id"), col("parent_id"), col("label"),
          col("is_leaf"), col("depth"), lit(ok).as("parse_roundtrip_ok"))
        .orderBy(col("node_id"))
    },
    Some(
      """SELECT * FROM (VALUES
        |  (1, -1, 'root',     FALSE, 0, TRUE),
        |  (2,  1, 'adoption', FALSE, 1, TRUE),
        |  (3,  1, 'risk',     FALSE, 1, TRUE),
        |  (4,  2, 'P',        TRUE,  2, TRUE),
        |  (5,  2, 'A',        TRUE,  2, TRUE),
        |  (6,  3, 'N',        TRUE,  2, TRUE),
        |  (7,  3, 'U',        TRUE,  2, TRUE))
        |  AS t(node_id, parent_id, label, is_leaf, depth, parse_roundtrip_ok)
        |ORDER BY node_id""".stripMargin))

  def queries: Seq[Q] = Seq(qEntityEnrich, qThemeRollup, qThemeTree)
}
