package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.analytics.MarketPipeline

/** §3.1's step-6 graph arm (`AI_Cost_Cutting_Market_Analysis/src/
  * network_analysis.py`, traced in SURVEY.md §3.1) composed as ONE gated
  * pipeline that CONTINUES from [[MarketPipeline.labeledSearch]] — the
  * market lifecycle's weekly panel and this network are two arms of the
  * same labeled search frame, and sharing the stage-1-4 builder (and its
  * SQL twin) is what makes that visible to the gate. Every stage is
  * individually gated (`q_comention_edges`' G1-G3, `q_spring_layout`'s G6
  * protocol); this query gates the COMPOSITION — role suffixing, the
  * min-occurrence company filter, the per-DOCUMENT pair counting, and the
  * node set the layout receives.
  *
  * Stage map (reference line → here):
  *  1. labeled search (ipynb cells 18-27) → [[MarketPipeline.labeledSearch]]
  *     verbatim — search fan-out, (sentence, entity) dedup, multi-span
  *     mask, label+guard;
  *  2. role tagging + suffix union (`network_analysis.py:110-127`):
  *     adopters = label A → `name_user`, providers = label P →
  *     `name_provider` — the suffixes keep a company acting in both roles
  *     as two nodes, the reference's `_without_common` trick;
  *  3. min-occurrence filter (`:97-107`): companies with ≥ 2 rows in their
  *     role frame survive (`value_counts() >= min_occurrences`);
  *  4. co-mention pairing (`:154-196`): provider × adopter within one
  *     group, counted ONCE per group however many row pairs carry it
  *     (`group['Company'].unique()` — distinct-group weight, not the row
  *     product), threshold count ≥ 1. The REFERENCE groups per sentence
  *     (`df_filtered.groupby('sentence_id')` — J8/G2's grain); the engine
  *     deliberately widens the pairing to DOCUMENT grain because each
  *     synthetic sentence carries exactly one monitored entity, so
  *     sentence-grain pairing is degenerate on this corpus — the same
  *     corpus-shape adaptation as the watchlist-width note below;
  *  5. spring layout (`:206`: `nx.spring_layout(G, k=0.1, seed=42,
  *     dim=3)`) → [[GraphOps.springLayout]] with the same parameters,
  *     weighted by the pair count (nx's default `weight='weight'`).
  *
  * Gate protocol (G6's partial oracle): the iterated force loop has no SQL
  * rendering, so the gate projects what IS SQL-checkable about the chain —
  * the node SET (derived independently by the oracle from the SAME chained
  * SQL: labeled search → roles → min-occurrence → document pairs) and the
  * rescale invariants as booleans the oracle pins TRUE (every |coordinate|
  * ≤ 1 on all three axes, global max exactly 1). Coordinates themselves
  * stay spec-pinned in SpringLayoutSpec.
  *
  * Scale shape: stages 1-4 are the market pipeline's one-scan chain plus
  * two dimension-bounded hash aggregates (role counts ≤ |entities|, edges ≤
  * |providers|·|adopters| post-filter) — the min-occurrence sides broadcast.
  * The layout is the established presentation boundary: a bounded collect
  * with loud maxNodes/maxEdges guards (GraphOps.springLayout's contract).
  */
object NetworkPipeline {

  private val MinOccurrences = 2

  /** Role suffixes (`network_analysis.py:110-127`'s `_without_common`
    * node-splitting trick) and the labels that select each role frame —
    * ONE definition feeding both the Column chain and the oracle (via
    * [[Oracle.sqlLit]]), so a future rename can't desynchronize them. */
  private val ProviderSuffix = "_provider"
  private val AdopterSuffix = "_user"
  private val ProviderLabel = "P"
  private val AdopterLabel = "A"

  /** The graph study's monitored universe — WIDER than the market demo's
    * 8-company batch, via the same parameterized search builder (the
    * reference runs the network notebook over whatever watchlist the
    * analyst searched). Width matters for non-degeneracy at scale: a
    * co-mention needs TWO monitored companies in one document, so the
    * qualifying-document rate falls with the square of the watchlist's
    * share of the entity universe — with the 8-company demo batch the
    * synthetic corpus yields ZERO provider×adopter document pairs at
    * sf0.1 (measured), while 80 companies give 36/392/48 edges at
    * sf0.001/sf0.01/sf0.1. Ids beyond the corpus's supplier range simply
    * match nothing, so the list is SF-portable. */
  private[graft] val NetworkWatchlist: Seq[String] = (1 to 80).map(i => s"s$i")

  /** Stages 2-4: suffixed role frames → min-occurrence filter →
    * distinct-document co-mention edges. */
  private def comentionEdges(s: SparkSession, d: String): DataFrame = {
    // the SAME lineage cut the market pipeline takes on this frame: each
    // role arm reads it twice (rows + the min-occurrence counts), so
    // without the cut the search scan + dedup shuffle execute four times
    // in one plan (bench best 5.24 s uncut → 2.03 s cut at sf0.1,
    // pre-InSet watchlist rendering; both arms cheaper since). The frame is the
    // tiny watchlist × date-range slice; plan-only sweeps skip the cut.
    // r18 (guide §2.3, project before materializing): the graph arm reads
    // THREE columns — document_id, entity_name, label — so the cut
    // materializes exactly those instead of the full labeled frame
    // (text + masked_text + headline + motivation… — the heavy string
    // payload of the mask/label stages, ~10× the bytes, none of it read
    // downstream). The label computation itself is unchanged: the
    // projection sits AFTER labelColOn/guarded, it just stops their
    // inputs from riding into the checkpoint blocks.
    val labeled = graft.PlanProbe.cut(
      MarketPipeline.labeledSearch(s, d, NetworkWatchlist)
        .select(col("document_id"), col("entity_name"), col("label")))
    def role(label: String, suffix: String): DataFrame = {
      val rows = labeled.filter(col("label") === label)
        .select(col("document_id"),
          concat(col("entity_name"), lit(suffix)).as("company"))
      // min-occurrence: value_counts() >= MinOccurrences on the role frame
      val keep = rows.groupBy(col("company"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= MinOccurrences)
        .select(col("company"))
      // distinct (document, company) BEFORE the pair join: the edge weight
      // downstream is countDistinct(document_id), so duplicate role rows
      // within a document cannot change any value — but they DO multiply:
      // the ×10 hot-document skew probe measured the row-grain pair join
      // at 11.9 s vs 4.2 s uniform (one viral document with r provider ×
      // s adopter rows emits r·s pairs before the groupBy collapses
      // them). Post-distinct the hot document emits at most
      // |watchlist|² pairs — bounded by the monitored universe, not the
      // corpus. The min-occurrence count above stays ROW-grain
      // (value_counts semantics), so it is taken before the dedup.
      rows.join(broadcast(keep), Seq("company"), "left_semi").distinct()
    }
    val providers = role(ProviderLabel, ProviderSuffix)
      .withColumnRenamed("company", "src")
    val adopters = role(AdopterLabel, AdopterSuffix)
      .withColumnRenamed("company", "dst")
    providers.join(adopters, Seq("document_id"))
      .groupBy(col("src"), col("dst"))
      // ONCE per document group, not once per row pair (`unique()`)
      .agg(countDistinct(col("document_id")).as("weight"))
      .filter(col("weight") >= 1)
  }

  private val qNetworkPipeline = Q(
    "q_network_pipeline",
    // the G6 gate scaffold (plan-only upstream exposure + rescale
    // booleans) lives in ONE place — GraphOps.layoutGate — shared with
    // q_spring_layout; only the dimensionality differs (the reference's
    // network_analysis.py:206 lays out in 3-D)
    (s, d) => GraphOps.layoutGate(s, comentionEdges(s, d), dim = 3),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${MarketPipeline.labeledSearchSql(NetworkWatchlist)},
         |providers AS (
         |  SELECT document_id,
         |         entity_name || ${Oracle.sqlLit(ProviderSuffix)} AS company
         |  FROM labeled WHERE label = ${Oracle.sqlLit(ProviderLabel)}
         |  QUALIFY count(*) OVER (PARTITION BY company) >= $MinOccurrences
         |),
         |adopters AS (
         |  SELECT document_id,
         |         entity_name || ${Oracle.sqlLit(AdopterSuffix)} AS company
         |  FROM labeled WHERE label = ${Oracle.sqlLit(AdopterLabel)}
         |  QUALIFY count(*) OVER (PARTITION BY company) >= $MinOccurrences
         |),
         |edges AS (
         |  SELECT p.company AS src, a.company AS dst,
         |         count(DISTINCT p.document_id) AS weight
         |  FROM providers p JOIN adopters a
         |    ON p.document_id = a.document_id
         |  GROUP BY 1, 2
         |  HAVING count(DISTINCT p.document_id) >= 1
         |),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges)
         |SELECT node, TRUE AS in_range, TRUE AS axis_max_ok
         |FROM nodes ORDER BY node""".stripMargin))

  def queries: Seq[Q] = Seq(qNetworkPipeline)
}
