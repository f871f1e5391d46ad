package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md) plus the
  * derived relations of the engine's data model.
  *
  * The core relation is the chunk-row ("sentence") table — one row per
  * (document-chunk × target-entity) pair; schema documented in the reference at
  * `AI_Cost_Cutting_Market_Analysis/src/search.py:399-422`. Here it is realized
  * against the synthetic star schema: one "document" per order, one "chunk" per
  * lineitem, chunk text drawn deterministically from the `documents` corpus,
  * target entity = the lineitem's supplier.
  *
  * Every builder in this object has an exactly-equivalent DuckDB SQL rendering
  * in [[graft.Oracle]] so that driver correctness checks (DuckDB hash compare)
  * can replicate it bit-for-bit.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table's `ts` column has shipped in three physical parquet
    * vintages across testdata generator versions; [[normalizeEventTs]] folds
    * them all to a session-TZ `TimestampType` so every downstream consumer
    * (`session_window`, `window`, `withWatermark`, `unix_micros`) sees one
    * dtype:
    *
    *   - TIMESTAMP(NANOS): Spark refuses it by default — read the raw int64
    *     nanos via `nanosAsLong` and integer-DIV to a microsecond timestamp
    *     (a double division would lose precision above 2^53 ns).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true): loads as `TimestampType`
    *     directly; pass through.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): loads as
    *     `TimestampNTZType`; cast to `TimestampType`. With the session
    *     timezone pinned to UTC (every entry point in this repo does so) the
    *     cast preserves the wall clock, which is exactly DuckDB's reading of
    *     a naive timestamp — the `epoch_us` oracles stay bit-identical.
    *
    * Any other dtype (e.g. a string column from a broken generator) fails
    * HERE with a clear message instead of surfacing later as an opaque
    * analysis error inside `window()`. Pinned against tiny fixtures of all
    * three vintages AND the real testdata in EventsVintageSpec. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported dtype $other — expected int64 nanos " +
          "(LongType under nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ")
    }

  def events(s: SparkSession, d: String): DataFrame = {
    // Must be set before the read: without it the NANOS vintage fails at
    // scan time. Harmless for the other vintages.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Entity dimension (knowledge-graph analogue; reference
    * `Tracking_Inflation_Drivers/src/query_builder.py:194-224`).
    * suppliers/customers = COMP entities with sector = nation, industry_group =
    * region; parts = PROD entities with sector = brand, industry_group = type.
    * Small (hundreds of rows at any SF) — always broadcast-joined.
    */
  def entityDim(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = region(s, d).select(col("r_regionkey"), col("r_name"))
    val nr = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val sup = supplier(s, d)
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("s"), col("s_suppkey")).as("entity_id"),
        col("s_name").as("name"),
        lit("COMP").as("entity_type"),
        col("n_name").as("sector"),
        col("r_name").as("industry_group"),
        col("n_name").as("country"),
        concat(lit("S"), col("s_suppkey")).as("ticker"))
    val cust = customer(s, d)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("c"), col("c_custkey")).as("entity_id"),
        col("c_name").as("name"),
        lit("COMP").as("entity_type"),
        col("n_name").as("sector"),
        col("r_name").as("industry_group"),
        col("n_name").as("country"),
        concat(lit("C"), col("c_custkey")).as("ticker"))
    val prt = part(s, d).select(
      concat(lit("p"), col("p_partkey")).as("entity_id"),
      col("p_name").as("name"),
      lit("PROD").as("entity_type"),
      col("p_brand").as("sector"),
      col("p_type").as("industry_group"),
      lit("NONE").as("country"),
      concat(lit("P"), col("p_partkey")).as("ticker"))
    sup.unionByName(cust).unionByName(prt)
  }

  /** Chunk-row table (the engine's core relation).
    *
    * Mapping: document = order (document_id = o_orderkey, timestamp =
    * o_orderdate, document_type from o_orderpriority); chunk = lineitem
    * (chunk idx = l_linenumber, sentence_id = "{doc}-{idx}"); chunk text =
    * `documents.text` keyed by (l_orderkey*7 + l_linenumber) mod |documents|;
    * target entity = supplier (denormalized via nation/region).
    *
    * The plan is a star join: fact = lineitem⋈orders (both shuffle on
    * orderkey), all dimension sides are broadcast. At 100 TB the only shuffle
    * is the fact-fact equi-join; dims stay broadcast (they are tiny at every
    * SF by construction).
    */
  def chunkRows(s: SparkSession, d: String): DataFrame =
    chunkRowsPruned(s, d, withOrders = true, withSupplier = true,
      withCustomer = true, withText = true)

  /** [[chunkRows]] with only the dimension joins a consumer actually reads —
    * the generalized form of [[sentenceTopicRows]]' join elimination.
    *
    * Every dimension join in the chunk relation is an INNER join that
    * preserves fact rows exactly: each is keyed on a foreign key with
    * referential integrity by corpus construction (every l_orderkey has its
    * orders header, every l_suppkey its supplier, every o_custkey its
    * customer, and the pmod text-assignment key lands in [0, |documents|) by
    * construction), and each right side is unique on its key, so dropping an
    * unread dimension changes neither row multiplicity nor any surviving
    * column. Spark carries no FK metadata, so the join elimination an
    * RI-aware optimizer would perform is encoded here; TableContractSpec
    * pins the pruned projections row-equal to the full relation on real
    * testdata at two SFs.
    *
    * The payoff at 100 TB is structural: a consumer that reads no header
    * column skips the lineitem⋈orders fact-fact join entirely (the round-17
    * skew probe measured that join serializing a hot document), and every
    * consumer stops paying broadcast builds for dimensions it never reads.
    *
    * Column availability: lineitem alone provides document_id, sentence_id,
    * entity_id, entity_ticker, part_entity_id and the l_* measures
    * (document_id ≡ o_orderkey via the join equality, so it is derived from
    * l_orderkey in every variant); orders adds timestamp_utc, headline,
    * document_type, is_reporting_entity, other_entity_id; supplier (+ the
    * broadcast nation/region snowflake) adds entity_name/sector/industry/
    * country; customer (requires orders for o_custkey) adds
    * other_entity_name; documents adds text and lang. */
  def chunkRowsPruned(s: SparkSession, d: String,
      withOrders: Boolean = false, withSupplier: Boolean = false,
      withCustomer: Boolean = false, withText: Boolean = false): DataFrame = {
    require(!withCustomer || withOrders,
      "the customer dimension joins via orders' o_custkey")
    val l = lineitem(s, d)

    // Dimensions join the fact directly (not pre-joined into a snowflake):
    // each raw scan carries size stats, so Catalyst broadcasts every dim
    // STATICALLY — a pre-joined supplier⋈nation⋈region side has no stats and
    // degrades to a sort-merge join until AQE rescues it at runtime. No
    // broadcast() hints on the scaling sides (supplier/customer/documents
    // grow with the corpus; the choice must stay size-based for 100 TB).
    var df = l
    if (withOrders)
      df = df.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
    if (withSupplier)
      df = df
        .join(supplier(s, d).select(col("s_suppkey"), col("s_name"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .withColumn("sup_nation", col("n_name"))
        .withColumn("sup_region", col("r_name"))
    if (withCustomer)
      df = df.join(customer(s, d).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
    if (withText)
      // deterministic text assignment; |documents| scales with SF so the key
      // is taken modulo the actual corpus size (same expression in the oracle)
      df = df.join(documents(s, d).select(col("doc_id"), col("text"),
        col("lang")), docJoinCond(s, d))
    val cols = Seq(
      if (withOrders) Seq(col("o_orderdate").as("timestamp_utc")) else Nil,
      Seq(
        col("l_orderkey").cast("string").as("document_id"),
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).as("sentence_id")),
      if (withOrders) Seq(
        concat(col("o_orderpriority"), lit(" order "),
          col("o_orderkey").cast("string")).as("headline")) else Nil,
      Seq(concat(lit("s"), col("l_suppkey")).as("entity_id")),
      if (withOrders) Seq(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("news"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("transcripts"))
          .otherwise(lit("filings")).as("document_type"),
        (!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("is_reporting_entity")) else Nil,
      if (withSupplier) Seq(
        col("s_name").as("entity_name"),
        col("sup_nation").as("entity_sector"),
        col("sup_region").as("entity_industry"),
        col("sup_nation").as("entity_country")) else Nil,
      Seq(concat(lit("S"), col("l_suppkey")).as("entity_ticker")),
      if (withText) Seq(col("text"), col("lang")) else Nil,
      if (withOrders) Seq(
        concat(lit("c"), col("o_custkey")).as("other_entity_id")) else Nil,
      if (withCustomer) Seq(col("c_name").as("other_entity_name")) else Nil,
      Seq(
        concat(lit("p"), col("l_partkey")).as("part_entity_id"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_shipdate"))).flatten
    df.select(cols: _*)
  }

  /** Full-fidelity chunk-row relation: [[chunkRows]] plus the array-typed
    * columns every reference pipeline carries
    * (`AI_Cost_Cutting_Market_Analysis/src/search.py:399-422,430-448,462-465`;
    * `Tracking_Inflation_Drivers/src/search.py:263-264`):
    *
    *  - `entities`: array<struct{key,name,start,end}> — located entity
    *    mentions with 0-based char offsets, EVERY occurrence of each planted
    *    token (`customer`, `part`, `order` stand in for NER spans): the
    *    reference locates and masks all occurrences right-to-left
    *    (`search.py:430-448, 634-677`), so repeated-span behavior must be
    *    exercised at corpus scale, not just in property tests;
    *  - `other_entities`: comma-joined names of located entities OTHER than
    *    the masking target, one entry per DISTINCT key (P2's
    *    `array_join(filter(...))` projection lists each entity once however
    *    many spans it has; the target here is `other_entity_id`, the same key
    *    the masking pipeline masks to "Target Company" — the supplier never
    *    appears as a located span in the synthetic corpus);
    *  - `topics` / `topics_type`: parallel string arrays (zip-exploded by
    *    the topics pipelines).
    *
    * All additions are per-row projections — no extra joins or shuffles over
    * [[chunkRows]]; at 100 TB the arrays ride the same scan. The occurrence
    * enumeration is an interpreted HOF over char positions (O(|text|) per
    * row) — fidelity-column cost only; no headline/hot-path query reads it. */
  /** All 0-based start offsets of `token` in `text`, ascending —
    * non-overlapping enumeration (the reference's `finditer` semantics; our
    * planted tokens cannot self-overlap, so this equals the full scan).
    * Computed as a fold over `split(text, token)` segment lengths:
    * O(#occurrences) interpreted lambda steps per row instead of the
    * O(|text|) per-position probe a sequence+substr scan costs — the HOF's
    * input array is evaluated once, and each step touches only its segment.
    * Token must be regex-free (ours are alphanumeric).
    *
    * OFFSET UNIT: Unicode CODE POINTS (Spark's `length` semantics) — the
    * unit `Masking.maskUdf` declares for its span contract (it converts to
    * UTF-16 code units internally before splicing), so the spans are safe
    * on supplementary-plane text, not just the ASCII synthetic corpus;
    * pinned by the emoji round-trip test in TokenStartsSpec. */
  def tokenStarts(text: org.apache.spark.sql.Column,
      token: String): org.apache.spark.sql.Column = {
    val tl = token.length
    val segs = split(text, token)
    aggregate(
      slice(segs, lit(1), size(segs) - 1),
      struct(lit(0).cast("int").as("pos"),
        array().cast("array<int>").as("arr")),
      (st, seg) => struct(
        (st.getField("pos") + length(seg) + tl).cast("int").as("pos"),
        concat(st.getField("arr"),
          array((st.getField("pos") + length(seg)).cast("int"))).as("arr")),
      st => st.getField("arr"))
  }

  def chunkRowsFull(s: SparkSession, d: String): DataFrame = {
    val c = chunkRows(s, d)
    type Col = org.apache.spark.sql.Column
    def spans(key: Col, name: Col, token: String): Col =
      transform(tokenStarts(col("text"), token), p =>
        struct(key.as("key"), name.as("name"), p.as("start"),
          (p + token.length).cast("int").as("end")))
    c.withColumn("entities",
      concat(
        spans(col("other_entity_id"), col("other_entity_name"), "customer"),
        spans(col("part_entity_id"), col("part_entity_id"), "part"),
        spans(concat(lit("o"), col("document_id")),
          concat(lit("o"), col("document_id")), "order")))
      // one entry per distinct non-target KEY (first-span name), not one per
      // span — built from the first occurrence of each token, which keeps
      // the projection identical however many spans each entity has
      .withColumn("other_entities", {
        def firstSpan(key: Col, name: Col, token: String): Col = {
          val p = instr(col("text"), token)
          struct(key.as("key"), name.as("name"),
            (p - 1).cast("int").as("start"))
        }
        array_join(transform(
          filter(
            array(
              firstSpan(col("other_entity_id"), col("other_entity_name"), "customer"),
              firstSpan(col("part_entity_id"), col("part_entity_id"), "part"),
              firstSpan(concat(lit("o"), col("document_id")),
                concat(lit("o"), col("document_id")), "order")),
            e => e.getField("start") >= 0 &&
              e.getField("key") =!= col("other_entity_id")),
          e => e.getField("name")), ", ")
      })
      .withColumn("topics",
        array(col("entity_sector"), col("entity_industry"), col("other_entity_name")))
      .withColumn("topics_type", array(lit("SECT"), lit("REGI"), lit("COMP")))
  }

  /** Orders-free sentence projection: (sentence_id, entity_name,
    * entity_sector, entity_industry, text). Semantically equal to selecting
    * these columns from [[chunkRows]]: every orders-derived column is
    * pruned, and the lineitem⋈orders INNER join preserves rows exactly
    * (referential integrity holds by construction of the corpus — every
    * chunk belongs to a document header). Spark carries no FK metadata, so
    * the join elimination an RI-aware optimizer would perform is encoded
    * here for consumers that read none of the header columns.
    *
    * The payoff is structural, not one shuffle less: this projection is
    * MAP-ONLY (lineitem scan + broadcast dims), so per-row work — however
    * hot one document is — rides byte-split scan parallelism instead of a
    * hash(orderkey) shuffle partition. The round-17 skew probe measured the
    * joined shape serializing a 25%-hot document into one ~15 s task at
    * ×25, and AQE's OptimizeSkewedJoin cannot split it there: the fact
    * exchanges are multi-consumer (ReusedExchange) and the rule only
    * applies to a fragment containing exactly the join's two shuffle
    * stages. */
  def sentenceTopicRows(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val sup = supplier(s, d)
    val n = nation(s, d)
    val r = region(s, d)
    val doc = documents(s, d)
    l.join(sup.select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(doc.select(col("doc_id"), col("text")), docJoinCond(s, d))
      .select(
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).as("sentence_id"),
        col("s_name").as("entity_name"),
        col("n_name").as("entity_sector"),
        col("r_name").as("entity_industry"),
        col("text"))
  }

  /** The deterministic chunk-text assignment join: chunk (l_orderkey,
    * l_linenumber) reads the documents row keyed
    * `pmod(l_orderkey·7 + l_linenumber, |documents|)`. ONE definition for
    * every Spark-side consumer — [[chunkRowsPruned]], the flagship entry
    * relation, `q_dedup_exact`, `q_search_modes` — so the assignment
    * contract cannot drift between call sites (r17 ADVICE item 1); its
    * DuckDB twin is the text join inside [[graft.Oracle.chunkCte]]. */
  def docJoinCond(s: SparkSession, d: String): org.apache.spark.sql.Column =
    pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(docCount(s, d))) ===
      col("doc_id")

  /** Corpus size for the deterministic text-assignment key; an eager tiny
    * aggregate (single-column scan of a dimension table), memoized per sfDir
    * so repeated query construction doesn't re-run the job. */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def docCount(s: SparkSession, d: String): Long =
    docCountCache.computeIfAbsent(d, _ => {
      val row = documents(s, d).agg(max(col("doc_id"))).head()
      // fail by name on an empty table: getLong on the NULL max would
      // throw an opaque unboxing NPE, and the downstream pmod(_, 0)
      // assignment key is a divide-by-zero shape anyway
      require(!row.isNullAt(0),
        s"documents table at $d is empty — no doc_id to key text assignment")
      row.getLong(0) + 1
    })

  /** Conf key for the lineage-cut crossover threshold (bytes of on-disk
    * fact table); see [[beyondCutCrossover]]. */
  val CutCrossoverBytesKey = "spark.graft.cutCrossoverBytes"

  /** Default crossover: ~6× the sf0.1 gate corpus (lineitem ≈ 11 MB
    * there), safely below the ×10 blowup (≈ 108 MB) where the cut's win
    * is measured. */
  private val DefaultCutCrossoverBytes = 64L * 1024 * 1024

  /** On-disk bytes of the fact table (`lineitem.parquet`, file or
    * directory), memoized per sfDir — one filesystem stat per corpus, not
    * per query construction. */
  private val factBytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def factBytes(s: SparkSession, d: String): Long =
    factBytesCache.computeIfAbsent(d, dir => {
      val p = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      java.lang.Long.valueOf(fs.getContentSummary(p).getLength)
    })

  /** The measured lineage-cut crossover policy (round 18,
    * CutCrossoverProbe + BASELINE.md): cutting a shared DIMENSION-BOUNDED
    * frame (scaffold/exposure/board counts, semi/anti membership grains)
    * is a wash or a small loss at gate scale — the checkpoint's fixed job
    * cost rivals re-running 1-2 PRUNED corpus passes — and wins 1.2-1.5×
    * from the ×10 uniform blowup up, where each re-run pass re-scans a
    * corpus that no longer fits the page cache. The cut is therefore
    * gated on the fact table's on-disk size: below the threshold the
    * frame passes through uncut (the round-17 registered shapes, keeping
    * the sf0.1 bench round-over-round comparable), above it the consumer
    * wraps the frame in [[graft.PlanProbe.cut]]. Values are identical
    * either way — the cut is a materialization boundary, not a semantic
    * change (CutCrossoverProbe pins row equality at every operating
    * point) — so the policy can be size-adaptive without touching any
    * oracle. Unlike election's REJECTED corpus-fraction cut, every frame
    * under this policy is dimension-bounded, so the materialization
    * cannot grow with corpus volume. */
  private[graft] def beyondCutCrossover(s: SparkSession, d: String): Boolean =
    factBytes(s, d) >= s.conf.get(CutCrossoverBytesKey,
      DefaultCutCrossoverBytes.toString).toLong
}
