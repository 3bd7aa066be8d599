package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Regenerates PLANS.md (sbt "Test/runMain graft.tools.DumpPlans"):
  * `explain("formatted")` output for the headline plans, with the
  * scale property each one is supposed to exhibit stated above it —
  * the reviewable evidence behind SCALE.md's claims. Run at sf0.001
  * (plan SHAPE is scale-invariant; AQE runtime re-planning is asserted
  * separately in PlanQualitySpec against executed plans).
  */
object DumpPlans {

  private val Headliners: Seq[(String, String)] = Seq(
    "text_bm25_topk" ->
      """Term filter sits under the Generate (arrays_overlap pre-filter:
        |docs with no query term never explode); df joins broadcast; the
        |top-k is TakeOrderedAndProject, not a global Sort.""".stripMargin,
    "pipe_model_quality_score" ->
      """The (gram, weight) model table broadcasts; the corpus gram
        |stream is never shuffled for the lookup — the only exchange is
        |the doc-keyed re-aggregation with map-side partial agg.""".stripMargin,
    "dedup_minhash_lsh" ->
      """Banded-signature equi-self-join (no pair space): signatures are
        |checkpointed (ExistingRDD scan), candidates verified by exact
        |Jaccard, everything keyed — no nested-loop join anywhere.""".stripMargin,
    "ann_kmeans_probe_topk" ->
      """Trained-IVF nprobe search: Lloyd rounds fold over a broadcast
        |centroid row, assignment is map-only, and the probe join is a
        |cell-key equi-join that bounds the scanned corpus fraction.""".stripMargin,
    "pipe_decontam_bloom" ->
      """Bloom bits built executor-side over the (small) eval grams and
        |broadcast; the train corpus is filtered map-side and only the
        |~fpp survivors reach the exact verify join.""".stripMargin,
    "pipe_token_budget" ->
      """Two-level distributed prefix sum: the only unpartitioned
        |ordered window consumes the small (score, id-range) band
        |aggregate; band offsets rejoin the corpus by broadcast and the
        |per-row running sum is a band-partitioned window.""".stripMargin,
    "rel_interval_merge_scalable" ->
      """Range-bucketed interval merge: the sweep runs per (key, bucket)
        |window partition in parallel, then stitches bucket-boundary
        |regions — no single-partition window over a whole chromosome.""".stripMargin,
    "rel_interval_closest" ->
      """Join-free closest-feature sweep: one union, ONE exchange on
        |chrom, two Window passes — both GROWING frames (the suffix min
        |runs over the reversed in-partition sort; a shrinking
        |currentRow->unboundedFollowing frame would re-aggregate per
        |row, O(rows^2) per chromosome).""".stripMargin,
    "rel_join_star_revenue" ->
      """Star join: every dimension side is a BroadcastHashJoin; the
        |fact table is read once with pruned columns and pushed filters.""".stripMargin,
    "dedup_edit_verify" ->
      """Candidates are a shingle-posting equi-self-join; the length-gap
        |filter (a 2-int compare) sits BELOW the banded 3-arg
        |levenshtein, so the quadratic DP only runs on pairs that could
        |qualify — both prunes lossless by the metric's lower bound.""".stripMargin,
    "ann_mrl_rerank" ->
      """Matryoshka two-stage: the prefix-scored top-C window shuffles
        |only (q_id, vec_id, pcos) — wide vectors re-join AFTER the
        |candidate cut (candidate-bounded keyed join + broadcast query
        |fan); no vector column rides any exchange.""".stripMargin,
    "text_zipf_profile" ->
      """Vocab-bounded groupBy, TakeOrderedAndProject head cut (never a
        |global vocab sort); the only window is bounded by the constant
        |K and the regression sums are exact fixed-point BIGINTs.""".stripMargin,
    "pipe_ngram_novelty" ->
      """Each distinct gram credits exactly one novel owner (its min doc
        |id), so the only join runs at DOC cardinality — no join is
        |keyed on the gram column, and grams explode raw (no
        |CodegenFallback array_distinct under the Generate). 8.3x over
        |the naive gram-keyed join at sf0.1.""".stripMargin,
    "fmt_chain_lift_intervals" ->
      """Chain blocks BROADCAST onto a fixed bin grid, so the interval
        |probe is a bin-keyed equi-join (hash lookup) rather than a
        |per-row range scan; per-chain envelopes and the best-chain
        |max_by are keyed by the input interval — nothing pairwise,
        |and unmapped rows stay in-frame through the left join.""".stripMargin,
    "pipe_group_sample" ->
      """The custom bottom_k_by_key TypedImperativeAggregate keeps k
        |pairs per partial buffer, so the exchange carries O(groups*k)
        |rows with map-side combine — the row_number-window
        |formulation (the oracle) shuffles and sorts every row. 6.5x
        |on cached 40M-row input (BENCH_NOTES).""".stripMargin,
    "fmt_sam_pileup" ->
      """mpileup as relational algebra: the CIGAR walk is a codegen'd
        |HOF fold, the reference FASTA broadcasts onto the aligned-base
        |stream (BroadcastHashJoin — the read corpus never sort-merges),
        |and one (pos)-keyed partial agg carries the calls.""".stripMargin,
    "pipe_pagerank" ->
      """Iterative mass propagation in integer micro-units: each round
        |is ranks⋈edges + dst-keyed partial agg + dangling left-join,
        |localCheckpoint truncating lineage per round — associative
        |integer sums make ranks bit-identical on any partitioning.""".stripMargin,
    "ann_filtered_topk" ->
      """Metadata-filtered vector search: the label predicate reaches
        |the embeddings parquet scan as a PushedFilter BEFORE any
        |distance math, so a selective filter shrinks the corpus read
        |itself; queries stay a broadcast fan.""".stripMargin,
    "pipe_zorder_layout" ->
      """Morton interleave as a pure-arithmetic codegen'd bit fold; both
        |layout audits are ~20-group partial aggs. The Z layout's
        |bounding boxes stay near-square — the file-skipping economics
        |of Z-ordered writes, measured not asserted.""".stripMargin,
    "fmt_vcf_leftalign" ->
      """Reference-backed left-align with the genome NEVER broadcast:
        |only the .fai entry table ships with the closure; each task
        |byte-range-seeks the 4 kb reference blocks its variants touch
        |under a per-partition LRU, and SNV/symbolic rows skip the
        |reference entirely — I/O is O(distinct blocks), not O(genome).""".stripMargin,
    "fmt_mash_jaccard" ->
      """Mash sketching: genomes reduce to sketchSize i64 hashes BEFORE
        |any join (bottom-k window on the exploded k-mer stream); the
        |pairwise phase hashes sketch rows onto the broadcast pair keys
        |as TWO equi-joins union'd (A side, B side — never an
        |OR-condition nested loop); sequence data never rides an
        |exchange.""".stripMargin,
    "rel_interval_multiinter" ->
      """N-set interval partition: per-source deltas pivot to fixed
        |columns so ONE ordered running-sum window carries all three
        |coverages at once — N sets cost one sweep, not N window
        |passes, and per-base rows never materialize.""".stripMargin,
    "fmt_gfa_unitigs" ->
      """Unitig contraction: degree filters reduce links to chainable
        |edges (keyed aggs + equi-joins), then the pointer-doubling CC
        |labels chains in O(log diameter) keyed-shuffle rounds — the
        |graph walk is never a driver-side loop over edges.""".stripMargin,
    "fmt_vcf_kinship" ->
      """KING kinship oriented by the data's shape: sample pairs meet
        |through a SITE-keyed equi-self-join with map-side-combined
        |counts — the many-sites dimension moves once; no per-sample
        |vector ever collects to the driver.""".stripMargin,
    "fmt_sam_markdup" ->
      """MarkDuplicates: the clip-aware 5' signature is a codegen'd
        |CIGAR fold per row (no explode), then ONE window keyed by
        |(chrom, unclipped-5', strand) — near-unique keys, so the
        |shuffle is coverage-balanced and the survivor rule is a
        |deterministic in-partition sort.""".stripMargin,
    "pipe_triangle_stats" ->
      """Degree-ordered triangle counting: wedges build only at each
        |edge's low-(degree, id) endpoint (the O(m^1.5) bound that
        |survives power-law hubs), closure is a semi-join against the
        |canonical edge set, and the edge frame is checkpointed once
        |and reused three times.""".stripMargin,
    "ann_hamming_topk" ->
      """1-bit quantized search: sign-packing happens in the scan
        |projection, so the corpus side of the crossJoin carries two
        |longs per vector (16 bytes vs 256) and distance is
        |bit_count(xor) — ALU-only, fully codegen'd, queries a
        |broadcast fan.""".stripMargin,
    "fmt_sam_junctions" ->
      """Splice junctions from the native cigar_spans kernel: ONE
        |linear codegen'd walk per read (the HOF concat-append
        |alternative copies the growing pair list once per op —
        |quadratic on 10k-op long-read CIGARs), two Generates bounded
        |by span count, and a junction-keyed partial-agg count as the
        |only exchange.""".stripMargin,
    "fmt_taxon_lca" ->
      """Kraken-style LCA: the taxonomy's ancestor closure (hybrid —
        |per-tree parent-chain walk in ONE expression for small trees,
        |pointer-doubling with a provable round budget for deep ones;
        |no per-round convergence action either way) BROADCASTS onto
        |the read-hit stream; the deepest all-hits-covering ancestor
        |falls out of two keyed aggs — reads never reshuffle on
        |anything but their own id.""".stripMargin,
    "rel_time_gap_fill" ->
      """LOCF gap fill: the hour spine derives from a 1-row min/max
        |aggregate broadcast (never a global window); the
        |forward-fill window is partitioned by event_type with hours
        |as the sort key, so fill parallelism is the key cardinality
        |and no task sees more than one type's spine.""".stripMargin,
    "rel_anomaly_hours" ->
      """Exact 3-sigma flags: (H·v-S)² > 9(H·Q-S²) — the square runs in
        |DECIMAL(38,0) so it cannot wrap int64 — with the 9-row
        |per-type stats BROADCAST back onto the hourly frame; the
        |hours shuffle exactly once, for their own aggregation.""".stripMargin,
    "rel_weighted_median" ->
      """Histogram-first weighted median (the round-9 ScaleProbe catch:
        |a per-ROW ordered window measured α≈1.0 at 10M events):
        |weights COLLAPSE to one row per (type, value) with map-side
        |partial agg BEFORE the cumulative window, so the ordered
        |window input is value-cardinality (~20k centi buckets) per
        |type no matter how many raw rows feed it; totals rejoin by
        |broadcast.""".stripMargin,
    "rel_hhi_by_segment" ->
      """HHI concentration in exact ppm: the customer dimension
        |BROADCASTS onto orders, then two keyed aggs (customer revenue
        |→ segment Σc²) with map-side partials; Σc²·1e6 ~1e23 runs in
        |DECIMAL(38,0) and only the ≤1e6 ppm BIGINT leaves the plan.""".stripMargin,
    "rel_cusum_changepoint" ->
      """Integer-exact CUSUM: ONE type-partitioned ordered window
        |carries the running sums (hour cardinality per type, never a
        |global sort); the per-type mean folds in by broadcast, and
        |the argmax is a keyed max_by — no per-candidate re-scan of
        |the series.""".stripMargin,
    "rel_log2_histogram" ->
      """log2 value histogram via length(bin(v)) — a pure-arithmetic
        |codegen'd bit-bucket identical in both engines (no libm) —
        |so the whole histogram is one map-only projection + one
        |bucket-keyed partial agg.""".stripMargin,
    "fmt_vcf_sfs_folded" ->
      """Folded site-frequency spectrum: allele counts fold map-only to
        |min(ac, 2n-ac) per site, then ONE partial-agg'd histogram
        |keyed by the folded count — sites never ride more than their
        |own aggregation exchange, samples never unpivot.""".stripMargin,
    "fmt_pdb_gyration" ->
      """Radius of gyration per chain: n²Rg² = nΣ|r|² − |Σr|² in
        |integer milli-Å², so the mean never materializes and the five
        |Σ terms fold map-side through ONE chain-keyed partial agg —
        |no atom ever rides a second shuffle.""".stripMargin,
    "fmt_fastq_demux" ->
      """1-mismatch demux as a hash probe: the whitelist ENUMERATES its
        |≤19 Hamming≤1 variants (tiny side), reads equi-join their 6bp
        |prefix under a BroadcastHashJoin — O(reads) at any whitelist
        |size, where the Hamming-theta BNLJ alternative is
        |reads × whitelist.""".stripMargin,
    "rel_bollinger_bands" ->
      """Rolling 24h 2σ breaks with the stats travelling IN the window
        |(three running sums over a ROWS 23 PRECEDING frame, one
        |type-partitioned pass — no broadcast, no second shuffle); the
        |square runs in DECIMAL(38,0) so the flag bit cannot wrap
        |int64.""".stripMargin,
    "rel_daily_autocorr" ->
      """Lag-24 rate autocorrelation as signed r² micro: ONE
        |type-partitioned lag window over the hourly count frame, one
        |keyed reduce of the n-multiplied integer parts, sign applied
        |OUTSIDE the positive quotient so Spark's truncate and DuckDB's
        |floor cannot diverge.""".stripMargin,
    "rel_kendall_tau" ->
      """The O(n²) pair stage never sees the corpus: one keyed agg
        |collapses lineitem to a calendar-bounded daily frame, the pair
        |join is a BroadcastHashJoin on returnflag with the day-order
        |theta as a post-condition, and the tau quotient extracts its
        |sign before dividing so both engines divide
        |non-negatives.""".stripMargin,
    "rel_winsorized_mean" ->
      """Robust mean without percentile-function semantics drift: the
        |p05/p95 bounds come from an arithmetic rank formula over a
        |type-partitioned row_number window (parallel across types,
        |never global), return as a 2-value-per-type broadcast, and the
        |clamp+mean is one map-side pass over the corpus.""".stripMargin,
    "ann_centroid_shift" ->
      """Integer-exact drift gauge: components quantize to micro at the
        |scan, one explode+keyed agg builds the |labels|×dim sum frame
        |(barriered — the embeddings parquet appears ONCE), the global
        |centroid re-aggregates THAT frame, and the staged integer
        |divisions keep every intermediate under DECIMAL(38,0)/HUGEINT
        |range at the sf10 tier.""".stripMargin,
    "rel_rfm_segments" ->
      """Quartile segmentation WITHOUT a global rank: percentile_disc
        |thresholds collapse to one broadcast row, classification is a
        |map-side comparison, and the plan carries zero window
        |operators — the ntile formulation would single-partition-sort
        |every customer.""".stripMargin,
    "rel_cdc_latest" ->
      """Last-write-wins compaction as ONE keyed agg: max(struct(ts,
        |event_id, ...)) with partial_max below the exchange — each
        |executor ships one candidate row per key, never the key's
        |history; the window formulation would shuffle + sort the full
        |log.""".stripMargin,
    "ann_knn_graph" ->
      """kNN graph build stays cell-bounded AND the bound scales: cells
        |come from a trained quantizer sized k ~ n/64, so the
        |self-join's equi-key holds sum(|cell|^2) ~ 64n linear in the
        |corpus; ranking happens within the cell partition, and the
        |reciprocity pass re-reads the BARRIERED kNN frame — the
        |corpus parquet appears in no later stage.""".stripMargin,
    "text_source_cosine" ->
      """Pairwise source cosine² with NO source×source scan: the pair
        |space is an equi-join on the bigram TYPE key (bounded by
        |shared-type cardinality); per-million integer profiles are
        |barriered once (ExistingRDD on both join sides) and the
        |per-source norms rejoin the 190-row pair frame by broadcast.""".stripMargin,
    "rel_ks_two_sample" ->
      """Two-sample KS: the corpus COLLAPSES to the $100-bin frame
        |(map-side partial agg under the exchange) before the
        |single-partition ECDF window ever runs — the window's input
        |is price-range-bounded, and the orders→customer join
        |broadcasts the dimension; the argmax is TakeOrdered, not a
        |global sort.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (`explain formatted`)\n\n")
    sb.append(s"Regenerate: `sbt \"Test/runMain graft.tools.DumpPlans\"` ($sfDir).\n")
    sb.append("Each plan is preceded by the scale property it must exhibit;\n")
    sb.append("PlanQualitySpec asserts these structurally against EXECUTED\n")
    sb.append("(AQE-final) plans — this file is the human-readable evidence.\n")
    Headliners.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n")
      sb.append(why.linesIterator.map("> " + _).mkString("\n")).append("\n\n")
      sb.append("```\n").append(plan.trim).append("\n```\n")
    }
    Files.write(Paths.get("PLANS.md"), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote PLANS.md (${Headliners.size} plans)")
    spark.stop()
  }
}
