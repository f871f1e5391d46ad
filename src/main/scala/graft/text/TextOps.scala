package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Training-data text analysis + deduplication over the `documents` corpus:
  * exact/fingerprint dedup, n-gram Jaccard, MinHash+LSH, SimHash, language-ID,
  * quality scoring, token counting.
  *
  * Everything — including the MinHash/SimHash pipelines — is expressed in
  * whole-stage-codegen'd built-in functions (no UDFs): the shingle→hash→band
  * machinery is a shared polynomial hash both engines can evaluate, so even
  * the sketching operators have exact DuckDB oracles.
  *
  * Scale notes: all-pairs similarity is never materialized; candidate
  * generation is always bounded — shingle-bucket join (n-gram Jaccard),
  * band-bucket join (MinHash LSH), fingerprint-byte bucketing (SimHash). At
  * 100 TB the same plans hold: the explode side is O(corpus tokens) and every
  * join keys on a bucket id.
  */
object TextOps {

  // ---- shared deterministic primitives (Spark Column + DuckDB SQL twins) ----

  /** Polynomial rolling hash over character codes, mod 2^31-1 — identical
    * left-to-right fold in both engines. Spark evaluates higher-order
    * functions INTERPRETED (no codegen), so this is reserved for
    * once-per-document fingerprinting; the per-shingle hot path uses
    * [[hash32]]. */
  private def polyHash(e: Column): Column =
    aggregate(transform(split(e, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % 2147483647L)

  private def polyHashSql(e: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split($e, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % 2147483647)"

  /** First `hexDigits` md5 hex digits as a non-negative long — ONE
    * parameterized definition (with its DuckDB twin below) behind both the
    * 32-bit shingle/minhash hash and the 60-bit SimHash fingerprint, so a
    * fold or cast change cannot reach one width and miss the other. On the
    * Spark side this is conv(substr(md5)) — all codegen'd built-ins, so the
    * sketching pipelines stay inside whole-stage codegen (the char-fold
    * variant above measured 100× slower in the interpreted path). */
  private[graft] def hashN(e: Column, hexDigits: Int): Column =
    conv(substring(md5(e), 1, hexDigits), 16, 10).cast("long")

  private[graft] def hashNSql(e: String, hexDigits: Int): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(" +
      s"string_split(substr(md5($e), 1, $hexDigits), ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
      s"(acc, x) -> acc * 16 + x)"

  private[graft] def hash32(e: Column): Column = hashN(e, 8)

  private[graft] def hash32Sql(e: String): String = hashNSql(e, 8)

  /** 3-word shingles of the whitespace-tokenized text (empty below 3 words).
    * Built by zipping three shifted slices — NOT `transform(sequence, i ->
    * element_at(words, i))`: higher-order lambdas are interpreted and do not
    * CSE the `split`, so the index form re-splits the text per element
    * (O(words²) per doc; profiled as the hottest stack in the whole bench). */
  private def shingles(text: Column): Column = {
    val words = split(text, " ")
    val n = size(words)
    when(n >= 3,
      zip_with(
        zip_with(slice(words, lit(1), n - 2), slice(words, lit(2), n - 2),
          (x, y) => concat(x, lit(" "), y)),
        slice(words, lit(3), n - 2),
        (xy, z) => concat(xy, lit(" "), z)))
      .otherwise(array())
  }

  /** DuckDB CTE producing (doc_id, s) distinct shingles — twin of
    * [[shingles]] + explode + distinct. */
  private[text] val shingleCte: String =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(generate_series(1, greatest(len(words) - 2, 0)),
      |           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS s
      |  FROM ws
      |)""".stripMargin

  /** The documents table arrives as one small parquet file = ONE input
    * partition; repartition before the explode so shingle work parallelizes
    * (at 100 TB the scan has thousands of splits and this is a no-op cost-
    * wise — it keeps the local plan honest about downstream parallelism). */
  private[text] def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      .distinct()

  // ---- queries ----

  /** Normalized text for content fingerprints: LOWERCASE FIRST, then strip
    * non-alphanumerics — the other order deletes uppercase letters instead
    * of normalizing them ('The cat' and 'the cat' would get different
    * digests, while 'HELLO' and an empty doc would collide). Invisible on
    * the all-lowercase fixture corpus, so the ordering is load-bearing for
    * real text even though no gate can catch it. */
  private def fpNorm: Column =
    regexp_replace(lower(col("text")), "[^a-z0-9]", "")

  private val fpNormSql: String =
    "regexp_replace(lower(text), '[^a-z0-9]', '', 'g')"

  /** Normalized-content digest (md5 over lowercased alphanumerics) — the
    * exact-dedup key. Shared by the fingerprint query and the streaming
    * ingest dedup ([[graft.streaming.CorpusStream.dedupedDocuments]]), so
    * batch and stream agree on what "the same document" means. */
  private[graft] def fingerprintMd5: Column = md5(fpNorm)

  /** Exact/near-exact dedup via content fingerprints: md5 of the
    * normalized text plus the polynomial rolling hash. */
  private val qFingerprint = Q(
    "q_text_fingerprint",
    (s, d) => {
      Tables.documents(s, d)
        .withColumn("fp_md5", fingerprintMd5)
        .withColumn("fp_roll", polyHash(fpNorm))
        .groupBy(col("fp_md5"), col("fp_roll"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy(col("fp_md5"))
    },
    Some(
      s"""WITH fp AS (
         |  SELECT doc_id,
         |         md5($fpNormSql) AS fp_md5,
         |         ${polyHashSql(fpNormSql)} AS fp_roll
         |  FROM documents
         |)
         |SELECT fp_md5, fp_roll, count(*) AS n_docs, min(doc_id) AS keeper
         |FROM fp GROUP BY fp_md5, fp_roll ORDER BY fp_md5""".stripMargin))

  /** Document-frequency cap for the Jaccard candidate join: shingles shared
    * by more than this many documents are dropped from the representation
    * (standard df/prefix filtering). Without it a stop-shingle appearing in k
    * docs emits k² candidate pairs — the quadratic hot-key tail at 100 TB.
    * At τ=50 the worst single shingle contributes ≤ 50²/2 pairs regardless of
    * corpus size. */
  private[graft] val ShingleDfCap = 50

  /** Production knobs paired with [[ShingleDfCap]] for HIGH-DUPLICATION
    * corpora. The df cap is CORPUS-RELATIVE: at duplication factor f every
    * shingle shared by more than τ/f base SOURCES crosses τ and leaves the
    * representation — measured by TextScaleStress at ×25 on the synthetic
    * corpus (whose sources share a ~30-word vocabulary, so almost no
    * shingle is source-unique): the default τ=50 admits only ≤2-source
    * shingles, documents retain ~0.1 shingles each, and raw Jaccard ties
    * at 1.0 on 1-2-element capped sets (1/20 same-family in the top-20).
    * The production pairing, exercised by TextScaleStress past 5·f > τ:
    *
    *  - '''[[ShingleDfCapConf]]''' — scale τ with expected duplication
    *    (τ = c·f, c ≈ 10): a near-dup representation must admit shingles
    *    with df ≥ f, because f-fold-duplicated sources share exactly
    *    those. The candidate volume grows to ≤ τ²/2 per shingle — the
    *    honest quadratic-in-f price when the TRUE pair count is itself
    *    quadratic in f (each cluster of f copies holds f·(f−1)/2 pairs).
    *    Production pipelines that can't pay it run exact dedup first,
    *    which collapses f back toward 1.
    *  - '''[[NgramMinInterConf]]''' — candidate pairs must share at least
    *    this many capped shingles (default 1 = off): with the cap scaled,
    *    true pairs share tens of surviving shingles while degenerate
    *    coincidence ties share 1-2, so a small floor (≥3-5) removes the
    *    ties without touching real near-dups.
    *
    * Tuned runs call [[ngramJaccardTop]] with explicit values. The session
    * confs below exist as a TRIPWIRE, not a tuning path: the gated
    * `q_ngram_jaccard` is oracle-locked to the defaults (its DuckDB twin
    * interpolates [[ShingleDfCap]] at registration and has no
    * min-intersection term), so if either conf is set during a gated run
    * the query FAILS FAST with a pointer here instead of silently
    * hash-mismatching against the default-valued oracle. */
  private[graft] val ShingleDfCapConf = "spark.graft.shingleDfCap"
  private[graft] val NgramMinInterConf = "spark.graft.ngramMinIntersection"

  /** n-gram Jaccard near-dup: df-capped distinct shingle sets, bucket join on
    * shingle, |A∩B| / |A∪B| over the capped vocabulary — top-20 most-similar
    * pairs (never thresholds to empty, deterministic at any SF). Both sizes
    * and intersections are computed over the SAME capped shingle sets, so the
    * similarity is a true Jaccard on the df-filtered representation.
    *
    * Parameterized — the production entry for tuned (duplication-scaled)
    * runs (TextScaleStress past 5·f > τ); the gated `q_ngram_jaccard`
    * pins the default operating point (dfCap = [[ShingleDfCap]],
    * minInter = 1), which is the point its DuckDB oracle spells out. */
  private[graft] def ngramJaccardTop(s: SparkSession, d: String,
      dfCap: Int, minInter: Int): DataFrame = {
      // TWO lineage cuts (r18): sh0 (the raw shingle explode+distinct) and
      // sh (the df-CAPPED shingle set). sh0 feeds the df aggregate and the
      // semi-join left side — without its cut the shingle explode executed
      // 8 times in one plan (8 parquet scans, zero reused exchanges). sh
      // feeds sizes and BOTH sides of the intersection self-join; before
      // r18 it was deliberately left uncut, so the df aggregate + semi-join
      // (a full shuffle of the shingle set by `s`, twice) re-executed for
      // every one of those three references — per-consumer column pruning
      // defeats ReusedExchange here exactly as in the r17 co-mention
      // negative result. Cutting the capped frame runs the df-cap pass
      // ONCE. PlanGuardSpec still sees the semi-join: plan-only sweeps skip
      // every cut, so the guarded optimized plan is the full pipeline.
      // (PlanProbe.cut ≡ localCheckpoint at execution time. Scope is
      // per-INVOCATION, not per-session: each call to this builder runs the
      // shingle job once and registers fresh checkpoints that the
      // ContextCleaner reclaims after the frames are unreachable — sharing
      // across invocations would need a memo like
      // SimilarityOps.nearDupIndexMemo, a deliberate non-goal here since
      // the gate invokes each query once per pass.)
      val sh0 = graft.PlanProbe.cut(docShingles(s, d))
      val ok = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select(col("s"))
      val sh = graft.PlanProbe.cut(sh0.join(ok, Seq("s"), "left_semi"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = sh.select(col("doc_id").as("doc_a"), col("s"))
      val b = sh.select(col("doc_id").as("doc_b"), col("s"))
      val inter0 = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      // min-intersection knob (see NgramMinInterConf doc): a
      // post-aggregation filter on the pair counts, so it costs nothing
      // when off (1) and never changes the candidate-join shape the df
      // cap bounds
      val inter =
        if (minInter > 1) inter0.filter(col("inter") >= minInter) else inter0
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
        .withColumn("jaccard",
          round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
        .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
  }

  private val qNgramJaccard = Q(
    "q_ngram_jaccard",
    (s, d) => {
      // tripwire (r13 advice): the oracle below is locked to the default
      // knobs — a session-conf override here would hash-mismatch the gate
      // silently, so refuse to run instead; tuned runs call
      // ngramJaccardTop with explicit values
      Seq(ShingleDfCapConf -> ShingleDfCap.toString,
        NgramMinInterConf -> "1").foreach { case (k, dflt) =>
        val v = s.conf.get(k, dflt)
        if (v != dflt) throw new IllegalStateException(
          s"$k=$v is set, but q_ngram_jaccard is oracle-locked to $dflt; " +
            "unset it for gated runs or call TextOps.ngramJaccardTop " +
            "directly for tuned runs")
      }
      ngramJaccardTop(s, d, ShingleDfCap, 1)
    },
    Some(
      s"""WITH $shingleCte,
         |ok AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $ShingleDfCap),
         |capped AS (SELECT sh.doc_id, sh.s FROM sh JOIN ok USING (s)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, inter,
         |       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY jaccard DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin))

  private val minhashA = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  private val minhashB = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val MinhashP = 2147483647L

  /** MinHash band table of a corpus: (doc_id, band, key) — 8 permutation
    * hashes over the shingle base hash, min per doc → signature; 4 bands of
    * 2 rows concatenated into the bucket key. This is the standing index
    * the near-dup family keys off: self-joined for candidate pairs
    * ([[lshCandidatePairs]]), stream-static joined by the streaming ingest
    * gate ([[graft.streaming.CorpusStream.nearDupCandidates]]). */
  private[graft] def bandTable(s: SparkSession, d: String): DataFrame =
    bandTableFrom(docShingles(s, d))

  /** [[bandTable]] over a PREBUILT (doc_id, s) shingle frame — lets a caller
    * that also reads the shingles directly (q_minhash_lsh's verification
    * sizes/intersection; the stress harness) share ONE shingle job instead
    * of paying the explode+distinct twice (r17: one corpus scan saved per
    * consumer; values identical — same definition, same rows). */
  private[graft] def bandTableFrom(shingles: DataFrame): DataFrame = {
    val hashed = shingles.withColumn("h", hash32(col("s")))
    val mhCols = minhashA.indices.map(j =>
      min((col("h") * minhashA(j) + minhashB(j)) % MinhashP).as(s"mh$j"))
    // localCheckpoint (PlanProbe.cut): the band table is SELF-joined by the
    // candidate-pair query, so without a lineage cut the whole
    // shingle+minhash pipeline would execute once per join side (measured:
    // zero exchange reuse across the self-join). The signature is 1 row/doc
    // — the cheapest thing in the pipeline to hold. Scope is
    // per-INVOCATION (each bandTable call builds afresh; the checkpoint is
    // reclaimed once the frame is unreachable) — callers that consume the
    // table more than once share the RETURNED frame instead
    // (TextScaleStress does).
    val sig = graft.PlanProbe.cut(hashed.groupBy(col("doc_id"))
      .agg(mhCols.head, mhCols.tail: _*))
    sig.select(col("doc_id"), explode(array(
      (0 until 4).map(bd => struct(lit(bd).as("band"),
        concat_ws("_", col(s"mh${2 * bd}"), col(s"mh${2 * bd + 1}"))
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Land the standing MinHash band table as a BUCKETED table
    * ([[graft.sources.SourceOps.writeBucketed]] on the FULL (band, key)
    * join key — a subset would not satisfy Spark's co-partition check and
    * both sides would shuffle again) — the 100 TB form of the near-dup
    * index. The band table grows with the corpus (4 rows/doc) and is NOT
    * broadcastable, so every consumer join — the batch candidate self-join
    * and the streaming ingest gate's per-micro-batch stream-static join
    * ([[graft.streaming.CorpusStream.nearDupCandidates]]) — would otherwise
    * re-shuffle the whole standing side each time. Bucketing pays that
    * shuffle once at write: the scan comes up hash-partitioned on
    * (band, key), so the join shuffles only the (tiny) arriving micro-batch
    * to match the buckets and the standing side plans with NO exchange —
    * pinned on the executed micro-batch plan in StreamingCorpusSpec.
    * Bucket count is a layout decision: size so one bucket fits executor
    * memory at target SF. */
  def landBandTable(s: SparkSession, d: String, table: String,
      buckets: Int): Unit =
    graft.sources.SourceOps.writeBucketed(bandTable(s, d), table,
      Seq("band", "key"), buckets)

  /** In-row MinHash band keys — the STREAM-side twin of [[bandTable]]: the
    * same shingle → hash32 → 8-permutation-min → 4-band pipeline computed
    * entirely with array lambdas inside one row, no explode/groupBy — a
    * pure projection, so a file stream can run it STATELESS. `min` over the
    * shingle multiset equals `min` over the distinct set, so the in-row
    * signature matches the batch explode+distinct+groupBy signature exactly
    * (set-equality pinned in StreamingCorpusSpec). Documents under 3 words
    * have no shingles and yield an EMPTY band array — the batch path drops
    * them from the signature table the same way. Interpreted-HOF cost is 8
    * passes over the shingle array per row — the same per-shingle hash work
    * as the batch path, paid in-row instead of in a shuffle.
    *
    * The hashed-shingle array is bound ONCE as a lambda variable (the
    * wrap-in-a-one-element-array trick): higher-order functions are
    * interpreted and Spark's subexpression elimination skips
    * LambdaVariable-containing trees, so a plain `val hs = transform(...)`
    * referenced from `size` plus all 8 minhash transforms would re-run
    * the full shingle split + one md5 per shingle at EVERY reference —
    * ~9 hash passes per arriving document on the streaming ingest hot
    * path instead of 1 (the same once-per-stage projection discipline
    * contaminationGate documents for its word array). */
  private[graft] def inRowBands(text: Column): Column =
    element_at(
      transform(array(transform(shingles(text), s => hash32(s))), hs => {
        val mh = minhashA.indices.map(j => array_min(
          transform(hs, h => (h * minhashA(j) + minhashB(j)) % MinhashP)))
        when(size(hs) > 0, array((0 until 4).map(bd =>
          struct(lit(bd).as("band"),
            concat_ws("_", mh(2 * bd), mh(2 * bd + 1)).as("key"))): _*))
          .otherwise(array().cast("array<struct<band:int,key:string>>"))
      }), 1)

  /** MinHash band-bucket candidate pairs (doc_a < doc_b, distinct): docs
    * sharing a band bucket of [[bandTable]] become candidates. Shared by
    * the LSH near-dup query, the duplicate-cluster connected-components
    * query ([[CorpusOps]]), and the scale-stress harness
    * ([[graft.tools.TextScaleStress]] — which must pin THIS definition,
    * not a re-implementation that could silently drift from the shipped
    * query). */
  private[graft] def lshCandidatePairs(s: SparkSession, d: String): DataFrame =
    lshCandidatePairsFrom(bandTable(s, d))

  /** [[lshCandidatePairs]] over a PREBUILT band table — lets a caller that
    * also reads the band table directly (the stress harness' Σb² check)
    * share one build instead of paying the shingle→minhash job twice. */
  private[graft] def lshCandidatePairsFrom(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** DuckDB CTE chain ending in `cand(doc_a, doc_b)` — twin of
    * [[lshCandidatePairs]] (includes the shingle CTEs). */
  private[text] val lshCandCte: String = {
    val mh = minhashA.indices.map(j =>
      s"min((h * ${minhashA(j)} + ${minhashB(j)}) % $MinhashP) AS mh$j")
      .mkString(", ")
    val bandSel = (0 until 4).map(bd =>
      s"SELECT doc_id, $bd AS band, CAST(mh${2 * bd} AS VARCHAR) || '_' || " +
        s"CAST(mh${2 * bd + 1} AS VARCHAR) AS key FROM sig")
      .mkString("\n  UNION ALL ")
    s"""$shingleCte,
       |hashed AS (SELECT doc_id, ${hash32Sql("s")} AS h FROM sh),
       |sig AS (SELECT doc_id, $mh FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSel
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  /** MinHash + LSH banding near-dup: band-bucket candidates
    * ([[lshCandidatePairs]]) verified with exact Jaccard ≥ 0.04. The only
    * joins are (a) band-bucket equi-join on tiny keys and (b) the
    * verification join restricted to candidates — the all-pairs matrix never
    * exists. */
  private val qMinhashLsh = Q(
    "q_minhash_lsh",
    (s, d) => {
      // four downstream uses (the band table build, sizes, and both sides
      // of the verification join) and no exchange reuse across them —
      // materialize the explode ONCE and feed it to the band table too
      // (r17: previously lshCandidatePairs built its own second shingle
      // job; one corpus scan + explode + distinct saved)
      val sh = graft.PlanProbe.cut(docShingles(s, d))
      val cand = lshCandidatePairsFrom(bandTableFrom(sh))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s").as("s2")), Seq("doc_b"))
        .filter(col("s") === col("s2"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
        .withColumn("jaccard",
          round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
        .filter(col("jaccard") >= 0.04)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(50)
    },
    Some {
      s"""WITH $lshCandCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.04
         |ORDER BY jaccard DESC, doc_a, doc_b
         |LIMIT 50""".stripMargin
    })

  private val SimhashBits = 60
  private val SimhashBandBits = 12
  private val SimhashBands = SimhashBits / SimhashBandBits // 5

  /** 60-bit content hash shared by both engines: first 15 hex digits of md5
    * (15×4 = 60 bits fits signed BIGINT in both). Codegen'd built-ins on the
    * Spark side, hex fold on the DuckDB side. */
  private def hash60(e: Column): Column = hashN(e, 15)

  private def hash60Sql(e: String): String = hashNSql(e, 15)

  /** SimHash: 60-bit fingerprint from signed per-bit votes of shingle hashes;
    * candidate pairs via 5 band tables of 12 bits each (the same banded trick
    * the MinHash query uses) — any two fingerprints within Hamming distance 4
    * leave at least one band untouched (5 bands, ≤4 flipped bits), so banding
    * has guaranteed recall at that radius. Emits the top-50 candidate pairs
    * by Hamming distance. At 100 TB the candidate join keys on (band, 12-bit
    * key): |pairs| ∝ Σ bucket², never the n²/256 a fixed-width bucket gives. */
  private val qSimhash = Q(
    "q_simhash",
    (s, d) => {
      val hashed = docShingles(s, d).withColumn("h", hash60(col("s")))
      val voteCols = (0 until SimhashBits).map(b =>
        sum(when((shiftright(col("h"), b) % 2) === 1, 1)
          .otherwise(-1)).as(s"bit$b"))
      val votes = hashed.groupBy(col("doc_id"))
        .agg(voteCols.head, voteCols.tail: _*)
      // 1 row/doc; cut before the band self-join (same rationale as the
      // MinHash signature checkpoint)
      val fp = graft.PlanProbe.cut(votes.select(col("doc_id"),
        (0 until SimhashBits).map(b =>
          when(col(s"bit$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp")))
      val bands = fp.select(col("doc_id"), col("fp"), explode(array(
        (0 until SimhashBands).map(bd => struct(lit(bd).as("band"),
          (shiftright(col("fp"), bd * SimhashBandBits)
            % (1 << SimhashBandBits)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("fp"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      bands.as("x").join(bands.as("y"), Seq("band", "key"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
        .distinct()
        .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(50)
    },
    Some {
      val voteCols = (0 until SimhashBits).map(b =>
        s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS bit$b")
        .mkString(", ")
      val fpExpr = (0 until SimhashBits).map(b =>
        s"CASE WHEN bit$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      val bandSel = (0 until SimhashBands).map(bd =>
        s"SELECT doc_id, fp, $bd AS band, " +
          s"(fp // ${1L << (bd * SimhashBandBits)}) % ${1 << SimhashBandBits} AS key FROM fp")
        .mkString("\n  UNION ALL ")
      s"""WITH $shingleCte,
         |hashed AS (SELECT doc_id, ${hash60Sql("s")} AS h FROM sh),
         |votes AS (SELECT doc_id, $voteCols FROM hashed GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($fpExpr AS BIGINT) AS fp FROM votes),
         |bands AS (
         |  $bandSel
         |),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         x.fp AS fp_a, y.fp AS fp_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
         |)
         |SELECT doc_a, doc_b, fp_a, fp_b,
         |       CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
         |FROM cand
         |ORDER BY hamming, doc_a, doc_b
         |LIMIT 50""".stripMargin
    })

  /** Language-ID by stopword-marker hits (n-gram heuristic) + confusion
    * matrix against the labeled `lang` column. (The synthetic corpus draws
    * one vocabulary for every lang, so accuracy is meaningless — the operator
    * under test is the deterministic scorer + argmax.) */
  private val qLangId = Q(
    "q_lang_id",
    (s, d) => {
      def hits(pat: String): Column = regexp_count(col("text"), lit(pat))
      val sEn = hits("\\b(the|a|of)\\b")
      val sDe = hits("\\b(der|das|und)\\b")
      val sFr = hits("\\b(le|la|et)\\b")
      Tables.documents(s, d)
        .withColumn("predicted",
          when(sEn >= sDe && sEn >= sFr, lit("en"))
            .when(sDe >= sFr, lit("de"))
            .otherwise(lit("fr")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },
    Some(
      """WITH scored AS (
        |  SELECT lang,
        |         len(regexp_extract_all(text, '\b(the|a|of)\b')) AS s_en,
        |         len(regexp_extract_all(text, '\b(der|das|und)\b')) AS s_de,
        |         len(regexp_extract_all(text, '\b(le|la|et)\b')) AS s_fr
        |  FROM documents
        |)
        |SELECT lang,
        |       CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
        |            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted,
        |       count(*) AS n
        |FROM scored
        |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin))

  /** Quality scoring: length, word count, mean word length, stopword ratio,
    * digit ratio → composite score (all ratios of small ints → exact doubles). */
  private val qQuality = Q(
    "q_quality_score",
    (s, d) => {
      val words = split(col("text"), " ")
      val nWords = size(words)
      val stopHits = regexp_count(col("text"), lit("\\b(the|a)\\b"))
      val digits = regexp_count(col("text"), lit("[0-9]"))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          nWords.cast("long").as("n_words"),
          round(length(col("text")).cast("double") / nWords, 6)
            .as("mean_word_len"),
          round(stopHits.cast("double") / nWords, 6).as("stopword_ratio"),
          round(digits.cast("double") / length(col("text")), 6)
            .as("digit_ratio"),
          round(
            least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5
              + (lit(1.0) - least(stopHits.cast("double") / nWords, lit(1.0))) * 0.5,
            6).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH m AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |         len(string_split(text, ' ')) AS n_words,
        |         len(regexp_extract_all(text, '\b(the|a)\b')) AS stop_hits,
        |         len(regexp_extract_all(text, '[0-9]')) AS digits
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, n_words,
        |       round(CAST(n_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
        |       round(CAST(stop_hits AS DOUBLE) / n_words, 6) AS stopword_ratio,
        |       round(CAST(digits AS DOUBLE) / n_chars, 6) AS digit_ratio,
        |       round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
        |             + (1.0 - least(CAST(stop_hits AS DOUBLE) / n_words, 1.0)) * 0.5,
        |             6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin))

  /** Token counting: whitespace tokens, a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols), and the chars/4 estimate
    * the reference's cost model uses (`labeling.py:411-432`). */
  private val qTokenCount = Q(
    "q_token_count",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .cast("long").as("bpe_tokens"),
        ceil(col("n_chars") / 4.0).cast("long").as("est_tokens"))
      .orderBy(col("doc_id")),
    Some(
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |       CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
        |FROM documents ORDER BY doc_id""".stripMargin))

  def queries: Seq[Q] = Seq(qFingerprint, qNgramJaccard, qMinhashLsh,
    qSimhash, qLangId, qQuality, qTokenCount)
}
