package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, designed for
  * 100 TB:
  *
  *  - exact:   one groupBy on a content hash — single shuffle, partial
  *             aggregation map-side.
  *  - MinHash+LSH: per-doc signatures are a single groupBy over exploded
  *             shingles (map-side partial min); banding turns the O(n^2)
  *             pair space into per-bucket joins, and only LSH candidates
  *             are verified exactly. This is the scale path.
  *  - SimHash: per-doc 32-bit sketch via higher-order functions (no
  *             shuffle at all until the pair join).
  *  - n-gram Jaccard (exhaustive) and embedding cosine: exact quadratic
  *             baselines, deliberately restricted to bounded subsets —
  *             at scale these exist to verify the sketch paths on
  *             samples, not to run on the full corpus.
  *
  * Oracle discipline: thresholds are integer comparisons
  * (5*inter >= 4*union, i.e. J >= 0.8) so no float boundary can flip a
  * row between engines. The LSH oracle is the exhaustive pair set: with
  * r=2,b=16 bands the miss probability at the observed J>=0.98 dup pairs
  * is ~1e-24, so LSH-candidates-then-verify equals the exhaustive answer.
  */
object Dedup {
  import Q.t

  /** MinHash permutation constants (fixed seed; Spark-side only — the
    * oracle never sees signatures, only the verified pair set). */
  private val MinhashPerms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    // a < 2^30 keeps a * h32 (h32 < 2^32) under 2^62 — no ANSI overflow.
    Seq.fill(32)((rnd.nextInt(1 << 29).toLong * 2 + 1, rnd.nextInt(Int.MaxValue).toLong))
  }
  private val P32 = 4294967311L // prime > 2^32


  /** doc_id + distinct 3-word shingles from any (doc_id, text) frame. */
  private[graft] def shingleSets(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        array_distinct(expr(
          "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("sh"))

  /** Containment core (dedup_containment /
    * [[graft.pipeline.CorpusOps.containmentPairs]]): pairs whose
    * 3-word-shingle containment inter / min(|A|, |B|) — the larger of
    * the two directed containments (Broder) — reaches `minPct`/100,
    * decided by integer cross-multiplication. Bounded posting-join
    * shape: candidates are pairs sharing a shingle; sizes broadcast
    * back. Expects (doc_id, text); returns
    * (id_a, id_b, inter, sz_a, sz_b), id_a < id_b. */
  private[graft] def containmentPairsOf(docs: DataFrame, minPct: Int): DataFrame = {
    val posting = docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("shingle"))
      .distinct()
      .transform(Q.barrier) // 3 consumers: both join sides + sizes
    val sizes = posting.groupBy("doc_id").agg(count(lit(1)).cast("int").as("sz"))
    posting.as("pa").join(posting.as("pb"),
        col("pa.shingle") === col("pb.shingle") && col("pa.doc_id") < col("pb.doc_id"))
      .groupBy(col("pa.doc_id").as("id_a"), col("pb.doc_id").as("id_b"))
      .agg(count(lit(1)).cast("int").as("inter"))
      .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a"))), "id_a")
      .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b"))), "id_b")
      .where(col("inter") * 100 >= least(col("sz_a"), col("sz_b")) * minPct)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"))
  }

  /** Edit-distance verification of near-dup candidates — the final
    * stage of a fuzzy-dedup pipeline (sketches nominate, an exact
    * string metric confirms). Candidates are the bounded posting-join
    * pairs sharing a 3-word shingle; a pair survives iff
    * `100 * levenshtein(a, b) <= maxPct * max(len_a, len_b)`,
    * integer-exact.
    *
    * Scale: two lossless prunes keep the O(len_a * len_b) DP off almost
    * every candidate. (1) Length gap: levenshtein >= |len_a - len_b|,
    * so pairs whose gap alone exceeds the budget are dropped by a
    * comparison on two ints (64% of candidates on the gate corpus).
    * (2) The DP itself runs BANDED via Spark's 3-arg `levenshtein`
    * (threshold = the pair's edit budget): it explores only the
    * +-threshold diagonal band and bails to -1 on overflow, turning the
    * worst case into O(threshold * len) per pair. Both prunes change
    * cost only, never the kept set, so the oracle is the plain
    * unbanded metric over the same candidates.
    *
    * Expects (doc_id, text); returns (id_a, id_b, dist, len_max),
    * id_a < id_b. */
  private[graft] def editVerifiedPairsOf(docs: DataFrame, maxPct: Int = 20): DataFrame = {
    // barrier: the doc frame feeds the posting build plus two text-join
    // sides; without it the candidate self-join re-derives each.
    val d = docs.select(col("doc_id"), col("text")).transform(Q.barrier)
    val posting = d
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("shingle"))
      .distinct()
    val cand = posting.as("pa").join(posting.as("pb"),
        col("pa.shingle") === col("pb.shingle") && col("pa.doc_id") < col("pb.doc_id"))
      .select(col("pa.doc_id").as("id_a"), col("pb.doc_id").as("id_b"))
      .distinct()
    cand
      .join(d.select(col("doc_id").as("id_a"), col("text").as("ta"),
        length(col("text")).as("len_a")), "id_a")
      .join(d.select(col("doc_id").as("id_b"), col("text").as("tb"),
        length(col("text")).as("len_b")), "id_b")
      .withColumn("len_max", greatest(col("len_a"), col("len_b")).cast("int"))
      .withColumn("budget", expr(s"cast(len_max * $maxPct div 100 as int)"))
      .where(abs(col("len_a") - col("len_b")) <= col("budget"))
      .withColumn("dist", expr("levenshtein(ta, tb, budget)"))
      .where(col("dist") >= 0) // 3-arg levenshtein: -1 = band overflow
      .select(col("id_a"), col("id_b"), col("dist"), col("len_max"))
  }

  /** doc_id + distinct 3-word shingles. The scan is spread first: the
    * split + trigram transform + array_distinct runs IN the scan
    * stage, and the testdata's single-file table would pin all of it
    * to one task (Q.spread is a no-op on an already-wide corpus). */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    shingleSets(Q.spread(t(s, dir, "documents"), "doc_id"))
  }

  /** 32-bit SimHash per doc via the native kernel (codegen'd; the
    * nested-HOF formulation costs ~17x interpreted). */
  private def simhashed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    Q.spread(t(s, dir, "documents"), "doc_id")
      .select(col("doc_id"),
        expr("graft_simhash32(array_distinct(split(text, ' ')))").as("simhash"))
  }

  /** MinHash+LSH candidate generation + exact verification: the shared
    * scale path behind dedup_minhash_lsh / dedup_filtered_corpus /
    * dedup_components. Returns verified (id_a, id_b, inter, uni) with
    * J >= 0.8 (integer-exact threshold). */
  private[queries] def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    lshVerifiedPairsOf(shingled(s, dir))

  /** (doc_id, bb) banded MinHash bucket keys of a shingle-set frame —
    * 32 permutation mins folded into 16 two-row bands; docs with
    * J >= 0.8 collide in some band with near-certainty (see the class
    * comment). This IS the LSH index: at scale it is computed once and
    * persisted, then self-joined (full dedup) or probed by a new batch
    * (incremental dedup). */
  private def bandBucketsOf(sets: DataFrame): DataFrame = {
    val hashed = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .withColumn("h32", expr("xxhash64(shingle) & 4294967295"))
    val sigCols = MinhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h32") * a + b) % P32).as(s"m$i")
    }
    val sigs = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until 16).map { j =>
      struct(lit(j).as("band"), xxhash64(col(s"m${2 * j}"), col(s"m${2 * j + 1}")).as("bh"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
  }

  /** Core of the MinHash+LSH scale path over any shingle-set frame
    * (doc_id, sh: array&lt;string&gt;) — see [[graft.pipeline.CorpusOps]]
    * for the public entry point. */
  private[graft] def lshVerifiedPairsOf(shingles: DataFrame): DataFrame = {
    // localCheckpoint, not cache: both materialize once, but checkpoint
    // blocks are released by the ContextCleaner as soon as the plan is
    // unreferenced (cache() pins them for the session), and the truncated
    // lineage stops the self-join below from re-deriving each side.
    // Trade-off at cluster scale: no lineage means an executor loss costs
    // a stage retry from the checkpoint job instead of a partition
    // recompute — acceptable for a 2-job window; a multi-hour pipeline
    // would use reliable checkpointing to the DFS instead.
    val sets = shingles.transform(Q.barrier)
    // Candidate pairs via an equi-self-join on the bucket key. Unlike a
    // per-bucket collect_set + pair explosion (one task owns the whole
    // bucket; needs a cap that silently DROPS hot buckets), the join
    // produces the exact candidate set and a stop-shingle-skewed bucket
    // is split across tasks by AQE's skew-join handling — pathological
    // skew degrades speed, never results.
    // Checkpointed so the 32xmin signature aggregate runs ONCE: Catalyst
    // plans the two join sides independently (no ReusedExchange fires —
    // one side is a broadcast, the other a hash exchange) and would
    // otherwise recompute the whole shingle->hash->agg pipeline per side.
    val bucketed = bandBucketsOf(sets).transform(Q.barrier)
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.bb") === col("y.bb") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))
          - size(array_intersect(col("sh_a"), col("sh_b")))).as("uni"))
      .where(col("inter") * 5 >= col("uni") * 4) // J >= 0.8
  }

  /** Per-row MinHash signature (array of the 32 permutation mins) as one
    * SQL expression over a shingle-array column `sh` — the map-only
    * formulation of the signature aggregate for rows arriving on a
    * stream. Identical constants and arithmetic to [[bandBucketsOf]]
    * (xxhash64 & 2^32-1, a*h+b mod P over the same distinct shingles),
    * so stream-computed and index-computed bucket keys collide
    * identically. */
  private[graft] val PerRowMinhashSql: String = MinhashPerms.map { case (a, b) =>
    s"array_min(transform(sh, g -> ((xxhash64(g) & 4294967295) * $a + $b) % $P32))"
  }.mkString("array(", ", ", ")")

  /** Band keys over a 32-min signature column `ms` (same 16x2 banding
    * and field types as [[bandBucketsOf]]). */
  private[graft] val PerRowBandsSql: String =
    "transform(sequence(0, 15), j -> named_struct('band', j, 'bh', xxhash64(ms[2*j], ms[2*j+1])))"

  /** The persisted corpus-side dedup index, materialized once: shingle
    * sets, banded LSH buckets, and content hashes — what an incremental
    * (batch or streaming) delta probes against. */
  private[graft] def corpusDedupIndex(corpus: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // spread: signature hashing runs in the corpus scan stage
    val c = Q.spread(corpus, "doc_id")
    val sets = shingleSets(c).transform(Q.barrier)
    val buckets = bandBucketsOf(sets).transform(Q.barrier)
    val hashes = corpus
      .select(col("doc_id"), md5(col("text").cast("binary")).as("mh"))
      .transform(Q.barrier)
    (sets, buckets, hashes)
  }

  /** Oracle for the %10=7 batch-vs-corpus split — exhaustive cross-set
    * pair scan; shared by dedup_incremental and stream_dedup_incremental
    * (same answer, batch vs streaming execution). Lazy: ShingleCteSql is
    * declared further down this object. */
  private[graft] lazy val IncrementalOracleSql: String = s"""WITH $ShingleCteSql,
        nearp AS (SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id
          FROM sh b JOIN sh c ON b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
            AND 5 * len(list_intersect(b.sh, c.sh)) >= 4 * (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh)))),
        exactp AS (SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id
          FROM documents b JOIN documents c
            ON b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7 AND md5(b.text) = md5(c.text))
        SELECT batch_id, min(corpus_id) AS dup_of
        FROM (SELECT * FROM nearp UNION ALL SELECT * FROM exactp)
        GROUP BY batch_id ORDER BY batch_id"""

  /** Winnowing core (dedup_winnowing / CorpusOps.winnowingPairs): pairs
    * of docs sharing >= `minShared` winnowed fingerprints over word
    * `gramWidth`-grams with window `window` — any common run of
    * `gramWidth + window - 1` words guarantees ONE shared fingerprint,
    * so the deterministic local-overlap guarantee holds only at the
    * default `minShared = 1` (a minimal lifted run can collapse to a
    * single distinct fingerprint; raise the threshold to trade the
    * guarantee for noise rejection on short common phrases).
    * Input: (doc_id, text); output: (id_a, id_b, n_shared). */
  private[graft] def winnowingPairs(docs: DataFrame, gramWidth: Int = 4,
                                    window: Int = 4, minShared: Int = 1): DataFrame = {
    require(gramWidth >= 1 && window >= 1 && minShared >= 1,
      s"winnowingPairs: gramWidth ($gramWidth), window ($window) and " +
        s"minShared ($minShared) must all be >= 1")
    val gramCols = (0 until gramWidth).map(j => s"w[i+$j]").mkString(", ")
    // spread: gram hashing + window mins run in the scan stage
    val posting = Q.spread(docs, "doc_id")
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= gramWidth + window - 1) // >= one full window
      .withColumn("hs", expr(
        s"""transform(sequence(0, size(w) - $gramWidth), i ->
              cast(conv(substr(md5(concat_ws(' ', $gramCols)), 1, 15), 16, 10) as bigint))"""))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(hs) - $window), j -> array_min(slice(hs, j + 1, $window))))")).as("fp"))
      .transform(Q.barrier) // both sides of the self-join
    posting.as("a").join(posting.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Incremental-dedup core: which `batch` docs (doc_id, text) duplicate
    * a `corpus` doc — exact (content-hash equality, covers docs too
    * short to shingle) or near (band collision + exact Jaccard >= 0.8).
    * Returns (batch_id, dup_of = lowest matching corpus id). The batch
    * side (buckets, shingle sets, hashes) is broadcast onto the corpus
    * stream: per-delta cost is a map over the corpus plus index work on
    * the batch, never a corpus reshuffle. At scale the corpus buckets
    * are the persisted LSH index, computed once and reused every batch
    * (rebuilt per call here — the gate is stateless). Public entry:
    * [[graft.pipeline.CorpusOps.dedupAgainstCorpus]]. */
  private[graft] def incrementalDupMatches(batch: DataFrame, corpus: DataFrame): DataFrame = {
    val b = batch.select(col("doc_id"), col("text"))
    val c = corpus.select(col("doc_id"), col("text"))
    // each side's shingle sets feed its buckets AND the verify join
    val setsB = shingleSets(b).transform(Q.barrier)
    val setsC = shingleSets(c).transform(Q.barrier)
    val cand = bandBucketsOf(setsC).select(col("doc_id").as("corpus_id"), col("bb"))
      .join(broadcast(bandBucketsOf(setsB)
        .select(col("doc_id").as("batch_id"), col("bb"))), Seq("bb"))
      .select("batch_id", "corpus_id").distinct()
    // verify with the CORPUS side streaming. The candidate relation is
    // collision-bounded, NOT batch-bounded (a stop-shingle bucket can
    // pair one batch doc with millions of corpus docs), so it is NOT
    // broadcast-hinted: AQE picks broadcast from runtime stats in the
    // normal case (the plan gate asserts no sort-merge at gate scale)
    // and degrades to a shuffle instead of an executor/driver OOM if a
    // pathological corpus explodes the candidate count. Only the truly
    // batch-bounded shingle lookup is forced broadcast.
    val near = setsC.select(col("doc_id").as("corpus_id"), col("sh").as("sh_c"))
      .join(cand.join(
        broadcast(setsB.select(col("doc_id").as("batch_id"), col("sh").as("sh_b"))),
        "batch_id"), "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        size(array_intersect(col("sh_b"), col("sh_c"))).as("inter"),
        (size(col("sh_b")) + size(col("sh_c"))
          - size(array_intersect(col("sh_b"), col("sh_c")))).as("uni"))
      .where(col("inter") * 5 >= col("uni") * 4) // J >= 0.8
      .select("batch_id", "corpus_id")
    val exact = c.select(col("doc_id").as("corpus_id"), md5(col("text").cast("binary")).as("mh"))
      .join(broadcast(b.select(col("doc_id").as("batch_id"),
        md5(col("text").cast("binary")).as("mh"))), Seq("mh"))
      .select("batch_id", "corpus_id")
    near.union(exact)
      .groupBy("batch_id").agg(min(col("corpus_id")).as("dup_of"))
  }

  /** Span-removal core (dedup_span_removal / CorpusOps.removeDuplicateSpans):
    * every `segWords`-word segment keeps exactly its FIRST corpus-wide
    * occurrence (min (doc_id, position) via a row_number window keyed
    * by segment content); later occurrences are cut and each document
    * is rebuilt from its surviving segments in order. Two keyed
    * shuffles (segment window + per-doc reassembly), no pair space;
    * the reassembly buffer is bounded by one document's length.
    * Input: (doc_id, text); output: (doc_id, n_segs, n_kept,
    * text_clean) — docs reduced to nothing keep a row with
    * n_kept = 0 and empty text so the caller can tell "emptied" from
    * "missing". */
  private[graft] def spanRemoval(docs: DataFrame, segWords: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(segWords >= 1, s"spanRemoval: segWords ($segWords) must be >= 1")
    val segs = docs
      .where(length(col("text")) > 0)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, size(w) - 1, $segWords)")).as("i"))
      .selectExpr("doc_id", "i", s"concat_ws(' ', slice(w, i + 1, $segWords)) AS seg")
      .transform(Q.barrier) // totals + window both consume it
    val kept = segs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("i"))))
      .where(col("rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(i, seg))), p -> p.seg)"))
          .as("text_clean"))
    segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** SemDeDup core (dedup_semantic / CorpusOps.semanticDedup):
    * k-means-partitioned within-cluster cosine dedup (Abbas et al.,
    * arXiv:2303.09540). Clustering reuses the deterministic 2-round
    * Lloyd shared with ann_kmeans_ivf ([[Similarity.kmeansAssigned]]).
    * The pair join keys on cluster id — pair count sum(|cell|^2) ~=
    * n^2/k for balanced cells; at scale pick k ~ n / target-cell-size
    * so per-cell work stays constant and no all-pairs path exists.
    * Input: (vec_id, v double array); output: (dropped_id, cid,
    * n_dups, max_cos) — one row per vector that has a LOWER-id
    * neighbor in a shared cell with cosine >= `minCosine`
    * (greedy-by-id keep-one-exemplar policy).
    *
    * `probes` > 1 multi-assigns each vector to its `probes` nearest
    * cells (the boundary-miss recall knob — see
    * [[Similarity.kmeansAssigned]]); a pair meeting in several shared
    * cells is collapsed to one (min cell id) before counting, so
    * n_dups counts NEIGHBORS, not cell coincidences, and the
    * probes = 1 output is unchanged. */
  private[graft] def semanticDropped(e: DataFrame, k: Int = 8,
                                     minCosine: Double = 0.4,
                                     probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.registerAll(e.sparkSession)
    // barrier: both pair-join sides consume the assignment — without it
    // the full Lloyd pipeline (two broadcast-assign passes + centroid
    // aggregation) re-derives per side
    val assigned = Similarity.kmeansAssigned(e, k, probes)._1.transform(Q.barrier)
    val a = assigned.select(col("cid"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = assigned.select(col("cid"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("cid")).where(col("id_a") < col("id_b"))
      .withColumn("cos", expr("round(graft_cosine_sim(va, vb), 6)"))
      .where(col("cos") >= minCosine)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("cid")).as("cid"), max(col("cos")).as("cos"))
      .groupBy(col("id_b"))
      .agg(min(col("cid")).as("cid"), count(lit(1)).as("n_dups"),
        max(col("cos")).as("max_cos"))
      .select(col("id_b").as("dropped_id"), col("cid"), col("n_dups"), col("max_cos"))
  }


  /** Distributed connected components by min-label propagation with
    * pointer doubling: each round relabels via graph edges AND via the
    * current label chain (node -> label(label(node))), so convergence
    * takes O(log diameter) rounds instead of O(diameter) — a
    * diameter-4096 path converges in ~12 rounds. Labels only ever
    * decrease, so the label sum strictly decreases until the fixpoint and
    * a single 1-row aggregate is the convergence check. Runs to TRUE
    * convergence; if the (absurd) round bound trips, it throws rather
    * than return partially-propagated labels.
    *
    * Input: undirected pair list (id_a, id_b); output: (node, label)
    * where label = min node id reachable.
    *
    * The loop sizes its OWN shuffle partitioning from the measured edge
    * count instead of inheriting `spark.sql.shuffle.partitions`: each
    * doubling round pays (scheduling floor × partition count) across ~3
    * shuffles, so a global knob tuned for the corpus-sized operators
    * inverts here — the round-10 sf10 A/B showed 128 partitions halving
    * dedup_minhash_lsh (94.9 → 48.6 s) while nearly tripling this loop
    * (57.7 → 155.1 s). The pair frame is tiny next to the corpus
    * (~16 B of longs per edge), so ~250k edges per partition keeps every
    * partition comfortably in executor memory while bounding the
    * per-round task count; the cap lets a genuinely huge edge set (a
    * 100 TB corpus's pair list) still fan out. */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.toDF("ea", "eb")
    val sym = edges.union(edges.select(col("eb"), col("ea"))).toDF("src", "dst").cache()
    val nEdges = sym.count() // forces the cache; sizes the loop's shuffles
    val loopParts = math.max(4L, math.min(nEdges / 250000L + 1L, 4096L)).toInt
    Q.withShufflePartitions(sym.sparkSession, loopParts) {
    // Seed with round 1 computed as ONE keyed agg: starting from
    // labels(x) = x, the first propagation round's output is exactly
    // min(node, min neighbor) — so fold it into the seed (one shuffle)
    // instead of paying a full join round to derive it. Same label
    // sequence from here on, one fewer round.
    var labels = sym.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .transform(Q.barrier)
    // prevSum = the seed's own sum (a 1-row agg over checkpointed
    // blocks): labels only decrease, so an unchanged sum == fixpoint —
    // seeding the comparison lets an already-converged seed (cliques,
    // star-shaped dup clusters) exit after ONE join round, not two.
    var prevSum = labels.selectExpr("coalesce(sum(label), 0) AS s")
      .collect()(0).getLong(0)
    var converged = false
    var rounds = 0
    val MaxRounds = 64 // log2-scale: diameter would need to exceed 2^64
    while (!converged) {
      if (rounds >= MaxRounds)
        throw new IllegalStateException(
          s"connected components failed to converge after $MaxRounds doubling rounds")
      // ONE join per round instead of three frames: the chain hop
      // node -> label(label(node)) is the same join shape as the edge
      // hop once each label row is read as an edge label(n) -> n, so
      // both propagate through a single (src)-keyed equi-join against
      // the label frame. The self term (labels itself) is redundant:
      // every node n receives label(label(n)) via its chain edge, and
      // label(label(n)) <= label(n) because label(x) <= x for all x —
      // so dropping the self-union changes nothing. Round cost falls
      // from ~5 exchanges (3 label sides + edges + union re-agg) to 2
      // (labels by node, edges∪chain by src; the min-agg reuses the
      // join's partitioning).
      val edgesAll = sym.union(labels.select(col("label").as("src"), col("node").as("dst")))
      // localCheckpoint doubles as per-round lineage truncation: without
      // it each round's plan nests the previous round's, and the driver
      // pays quadratic planning time by round ~10. Superseded rounds'
      // blocks are freed by the ContextCleaner once unreferenced.
      val propagated = edgesAll.join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("node")).agg(min(col("label")).as("label"))
        .transform(Q.barrier)
      val sum0 = propagated.selectExpr("coalesce(sum(label), 0) AS s")
        .collect()(0).getLong(0)
      labels.unpersist()
      labels = propagated
      converged = sum0 == prevSum
      prevSum = sum0
      rounds += 1
    }
    sym.unpersist()
    labels
    } // withShufflePartitions
  }

  /** Cluster-safe train/val assignment — the mechanism behind the
    * pipe_leakage_safe_split entry (see its comment for the leakage
    * rationale). Components over `pairs` label every doc; the label's
    * deterministic md5 bucket (of `buckets`, last `valBuckets` = val)
    * decides the split for the WHOLE cluster, so no near-dup pair
    * straddles it. The component frame is pair-bounded — tiny next to
    * the corpus — and broadcast onto `docs`; singletons fall through the
    * left join and split on their own id. Public entry:
    * [[graft.pipeline.CorpusOps.leakageSafeSplit]]. */
  private[graft] def leakageSafeSplitOf(docs: DataFrame, pairs: DataFrame,
      idCol: String, buckets: Int, valBuckets: Int): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(broadcast(comp), docs(idCol) === comp("node"), "left")
      .withColumn("component", coalesce(col("label"), col(idCol).cast("long")))
      .drop("node", "label")
      .withColumn("split",
        when(expr(s"cast(conv(substr(md5(cast(component as string)), 1, 8), 16, 10) as bigint) % $buckets")
            < buckets - valBuckets,
          lit("train")).otherwise(lit("val")))
  }

  private val ShingleCteSql =
    """sh AS (
         SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       for i in range(1, len(w) - 1)]) AS sh
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         WHERE len(w) >= 3)"""

  /** Cross-key duplication matrix core (see the dedup_source_matrix
    * entry comment): near-dup pairs lifted to unordered (key, key)
    * cells. Shared by the gate entry and
    * [[graft.pipeline.CorpusOps.dupSourceMatrix]]. */
  private[graft] def dupSourceMatrixCore(pairs: DataFrame, docs: DataFrame,
                                         idCol: String, keyCol: String): DataFrame = {
    val src = docs.select(col(idCol), col(keyCol))
    pairs
      .join(src.select(col(idCol).as("id_a"), col(keyCol).as("__sa")), Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(keyCol).as("__sb")), Seq("id_b"))
      .selectExpr("least(__sa, __sb) AS src_a", "greatest(__sa, __sb) AS src_b")
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  val qs: Map[String, Q] = Map(

    // ---- exact dedup: hash-groupBy (one shuffle; scales linearly) ----
    "dedup_exact" -> Q(
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
          .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- n-gram (trigram) Jaccard on a bounded subset ----
    // Inverted-index shape: explode shingles, equi-join on the shingle,
    // count co-occurrences — pairs sharing nothing never materialize
    // (they can't pass the threshold), and the join is a plain shuffle
    // hash join instead of a quadratic array_intersect nested loop.
    "dedup_ngram_jaccard" -> Q(
      (s, dir) => {
        // Row-level distinct instead of array_distinct-then-explode: the
        // HOF array pipeline is CodegenFallback, and evaluating it under
        // Generate measured ~12x slower than exploding raw shingles and
        // deduping (doc_id, shingle) rows — which shuffles the same data
        // the posting join shuffles anyway.
        val posting = t(s, dir, "documents")
          .where(col("doc_id") < 300)
          .withColumn("w", split(col("text"), " "))
          .where(size(col("w")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("shingle"))
          .distinct()
          .transform(Q.barrier) // 3 consumers: both join sides + sizes
        val sizes = posting.groupBy("doc_id").agg(count(lit(1)).cast("int").as("sz"))
        val inter = posting.as("pa").join(posting.as("pb"),
            col("pa.shingle") === col("pb.shingle") && col("pa.doc_id") < col("pb.doc_id"))
          .groupBy(col("pa.doc_id").as("id_a"), col("pb.doc_id").as("id_b"))
          .agg(count(lit(1)).cast("int").as("inter"))
        inter
          .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a"))), "id_a")
          .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b"))), "id_b")
          .select(col("id_a"), col("id_b"), col("inter"),
            (col("sz_a") + col("sz_b") - col("inter")).as("uni"))
          .where(col("inter") * 2 >= col("uni")) // J >= 0.5, integer-exact
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $ShingleCteSql
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
          CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS INTEGER) AS uni
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 300 AND b.doc_id < 300
          AND 2 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
        ORDER BY id_a, id_b""")),

    // ---- n-gram CONTAINMENT: the near-superset detector ----
    // Mechanism: containmentPairsOf (below the qs map) / public entry
    // [[graft.pipeline.CorpusOps.containmentPairs]].
    // Jaccard misses asymmetric duplication: a doc fully lifted into a
    // 10x longer one has J ~ 0.1 but containment ~ 1.0 (Broder's
    // resemblance-vs-containment distinction). Same bounded posting-join
    // shape as dedup_ngram_jaccard — shared-shingle candidates, integer
    // intersection counts — but thresholded on inter / min(|A|, |B|)
    // (the larger of the two directed containments), integer-exact via
    // cross-multiplication. At corpus scale the posting join inherits
    // the jaccard entry's bound: frequent-shingle postings are the skew
    // risk and would be capped upstream (see SCALE.md).
    "dedup_containment" -> Q(
      (s, dir) => containmentPairsOf(
          t(s, dir, "documents").where(col("doc_id") < 300), minPct = 90)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $ShingleCteSql
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
          CAST(len(a.sh) AS INTEGER) AS sz_a, CAST(len(b.sh) AS INTEGER) AS sz_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 300 AND b.doc_id < 300
          AND 10 * len(list_intersect(a.sh, b.sh)) >= 9 * least(len(a.sh), len(b.sh))
        ORDER BY id_a, id_b""")),

    // ---- edit-distance verification of candidate pairs ----
    // Mechanism: editVerifiedPairsOf (above the qs map) / public entry
    // [[graft.pipeline.CorpusOps.editDistancePairs]]. Shingle sketches
    // nominate, the exact string metric confirms — dist <= 20% of the
    // longer doc. Both Spark-side prunes (length gap, banded DP) are
    // lossless, so the oracle is the plain metric over the same
    // candidate set.
    "dedup_edit_verify" -> Q(
      (s, dir) => editVerifiedPairsOf(
          t(s, dir, "documents").where(col("doc_id") < 300))
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        post AS (SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       for i in range(1, len(w) - 1)])) AS shingle
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d)
                 WHERE len(w) >= 3),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
        SELECT c.id_a, c.id_b,
          CAST(levenshtein(da.text, db.text) AS INTEGER) AS dist,
          CAST(greatest(len(da.text), len(db.text)) AS INTEGER) AS len_max
        FROM cand c
        JOIN d da ON da.doc_id = c.id_a
        JOIN d db ON db.doc_id = c.id_b
        WHERE 5 * levenshtein(da.text, db.text) <= greatest(len(da.text), len(db.text))
        ORDER BY id_a, id_b""")),

    // ---- cross-source duplication matrix: WHERE the near-dups come
    // from. Verified LSH pairs lifted to (source, source) cells — the
    // audit that distinguishes a feed mirroring another feed from
    // within-source boilerplate. Pair frame is dedup-bounded, the two
    // source lookups are joins against the slim (doc_id, source)
    // projection, the cell matrix is at most |sources|². Oracle =
    // exact J >= 0.8 all-pairs lifted the same way (the verify step
    // makes the LSH path exact; same equivalence the minhash entry
    // rests on).
    "dedup_source_matrix" -> Q(
      (s, dir) => dupSourceMatrixCore(
        lshVerifiedPairs(s, dir).select("id_a", "id_b"),
        t(s, dir, "documents"), "doc_id", "source"),
      Some(s"""WITH $ShingleCteSql,
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          AND 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        m AS (SELECT least(da.source, db.source) AS src_a,
                     greatest(da.source, db.source) AS src_b
              FROM pairs
              JOIN documents da ON da.doc_id = pairs.id_a
              JOIN documents db ON db.doc_id = pairs.id_b)
        SELECT src_a, src_b, count(*) AS n_pairs
        FROM m GROUP BY src_a, src_b ORDER BY src_a, src_b""")),

    // ---- LSH banding calibration (the sizing companion to the entry
    // below): the S-curve P(candidate | Jaccard=s) = 1-(1-s^r)^b for
    // every way to split the 32-permutation signature into (bands,
    // rows) = (32,1)/(16,2)/(8,4)/(4,8), plus each config's s50 (the
    // Jaccard where collision probability crosses 1/2, ~(1/b)^(1/r)).
    // This is how a practitioner picks banding for a target dup
    // threshold BEFORE paying for a corpus pass — the gate's own
    // r=2,b=16 choice (header comment) reads straight off this table.
    // Pure closed-form math (no corpus input), so the oracle replays
    // the identical formula.
    "dedup_lsh_calibration" -> Q(
      (s, _) => {
        import s.implicits._
        val cfg = Seq((32, 1), (16, 2), (8, 4), (4, 8))
          .toDF("bands", "rows_per_band")
        // cast first: a bare id/20.0 is DECIMAL division in Spark but
        // DOUBLE in DuckDB — the value matches, the dtype would not
        s.range(1, 20).selectExpr("cast(id as double) / 20.0 AS s")
          .crossJoin(cfg)
          .selectExpr("bands", "rows_per_band", "s",
            "round(1 - pow(1 - pow(s, rows_per_band), bands), 6) AS p_candidate",
            "round(pow(1 - pow(0.5, 1.0 / bands), 1.0 / rows_per_band), 6) AS s50")
          .orderBy(col("bands").desc, col("s"))
      },
      Some("""WITH cfg(bands, rows_per_band) AS (VALUES (32, 1), (16, 2), (8, 4), (4, 8)),
        g AS (SELECT i / 20.0 AS s FROM range(1, 20) t(i))
        SELECT bands, rows_per_band, s,
          round(1 - pow(1 - pow(s, rows_per_band), bands), 6) AS p_candidate,
          round(pow(1 - pow(0.5, 1.0 / bands), 1.0 / rows_per_band), 6) AS s50
        FROM cfg CROSS JOIN g ORDER BY bands DESC, s""")),

    // ---- MinHash + LSH banding, exact-verify candidates (scale path) ----
    "dedup_minhash_lsh" -> Q(
      (s, dir) => lshVerifiedPairs(s, dir).orderBy("id_a", "id_b"),
      Some(s"""WITH $ShingleCteSql
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
          CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS INTEGER) AS uni
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        ORDER BY id_a, id_b""")),

    // ---- dedup as a corpus filter: drop the higher id of each J>=0.8
    //      pair found by MinHash+LSH (keep-lowest policy) ----
    "dedup_filtered_corpus" -> Q(
      (s, dir) => {
        val dropIds = lshVerifiedPairs(s, dir)
          .select(col("id_b").as("doc_id")).distinct()
        t(s, dir, "documents")
          .join(dropIds, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_checksum"))
      },
      Some(s"""WITH $ShingleCteSql,
        drops AS (SELECT DISTINCT b.doc_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
        SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)""")),

    // ---- near-dup clusters: connected components over the J>=0.8
    //      pair graph (iterative min-label propagation; converges in
    //      O(component diameter) joins, each a plain shuffle — the
    //      standard distributed CC shape). Oracle: recursive CTE
    //      computing min reachable id per node. ----
    "dedup_components" -> Q(
      (s, dir) => {
        val pairs = lshVerifiedPairs(s, dir).select("id_a", "id_b")
        connectedComponents(pairs)
          .select(col("node").as("doc_id"), col("label").as("component"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $ShingleCteSql,
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, label) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, min(label) AS component
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // ---- cluster-size audit over the near-dup components ----
    // The report a dedup run ships with: how much mass sits in clusters
    // of each size (a fat tail = boilerplate/template explosion worth a
    // targeted rule; all-pairs = something degenerate upstream). Sizes
    // and the histogram are two tiny keyed aggs over the pair-bounded
    // component frame — audit cost is independent of corpus size.
    "dedup_cluster_stats" -> Q(
      (s, dir) => {
        val pairs = lshVerifiedPairs(s, dir).select("id_a", "id_b")
        connectedComponents(pairs)
          .groupBy(col("label")).agg(count(lit(1)).cast("int").as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("label")).as("label_checksum"))
          .orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE $ShingleCteSql,
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, label) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        sz AS (SELECT component, CAST(count(*) AS INTEGER) AS cluster_size
               FROM comp GROUP BY component)
        SELECT cluster_size, count(*) AS n_clusters,
          CAST(sum(component) AS BIGINT) AS label_checksum
        FROM sz GROUP BY cluster_size ORDER BY cluster_size""")),

    // ---- SimHash sketch + Hamming near-dup pairs ----
    // 32-bit token hash from md5 hex so the oracle computes the identical
    // sketch: Spark conv(hex,16,10) == DuckDB CAST('0x'||hex AS BIGINT).
    "dedup_simhash" -> Q(
      (s, dir) => simhashed(s, dir).orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id,
          [CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) for tok in list_distinct(string_split(text, ' '))] AS hs
          FROM documents)
        SELECT doc_id,
          CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) >= 0
                         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
                    for j in range(0, 32)]) AS BIGINT) AS simhash
        FROM d ORDER BY doc_id""")),

    "dedup_simhash_pairs" -> Q(
      (s, dir) => {
        val sh = simhashed(s, dir).where(col("doc_id") < 300)
        val a = sh.select(col("doc_id").as("id_a"), col("simhash").as("ha"))
        val b = sh.select(col("doc_id").as("id_b"), col("simhash").as("hb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            bit_count(expr("ha ^ hb")).as("dist"))
          .where(col("dist") <= 3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (SELECT doc_id,
          [CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) for tok in list_distinct(string_split(text, ' '))] AS hs
          FROM documents WHERE doc_id < 300),
        s AS (SELECT doc_id,
          list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) >= 0
                         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
                    for j in range(0, 32)]) AS simhash
          FROM d)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS dist
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY id_a, id_b""")),

    // ---- embedding-cosine near-dup pairs (double arithmetic, rounded) ----
    "dedup_embedding_cosine" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.registerAll(s)
        val e = t(s, dir, "embeddings")
          .where(col("vec_id") < 300)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            expr("round(graft_cosine_sim(va, vb), 6)").as("cos"))
          .where(col("cos") >= 0.4)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings WHERE vec_id < 300)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6) >= 0.4
        ORDER BY id_a, id_b""")),

    // ---- SemDeDup: k-means partition, then within-cluster cosine ----
    // (core in semanticDropped above the registry, shared with
    // CorpusOps.semanticDedup)
    // Whole-corpus pairwise cosine is O(n^2) and dies at scale;
    // SemDeDup (Abbas et al., arXiv:2303.09540) bounds the pair space
    // by clustering embeddings first and comparing only within a
    // cluster. Reuses the deterministic 2-round Lloyd shared with
    // ann_kmeans_ivf (Similarity.kmeansAssigned — map-only assignment
    // against one broadcast centroid row). The pair join keys on cid: a
    // hash shuffle on cluster id, pair count sum(|cell|^2) ~= n^2/k for
    // balanced cells; at 100 TB k scales as n / target-cell-size so
    // per-cell work stays constant and no all-pairs path exists.
    // Drop policy (greedy by id, the SemDeDup "keep one exemplar per
    // eps-ball" approximation): a vector is dropped when a lower-id
    // vector in its cell has cosine >= the threshold.
    "dedup_semantic" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        semanticDropped(e).orderBy("dropped_id")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
        seeds AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        d1 AS (SELECT e.vec_id, s.cid, e.v,
                 round(list_sum([(e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i]) for i in range(1, 65)]), 6) AS d
               FROM e CROSS JOIN seeds s),
        a1 AS (SELECT vec_id, cid, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
               WHERE rn = 1),
        m1 AS (SELECT cid, i - 1 AS dim, round(avg(v[i]), 9) AS m
               FROM a1, range(1, 65) AS t(i) GROUP BY cid, i),
        c1 AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cid),
        d2 AS (SELECT e.vec_id, c.cid, e.v,
                 round(list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) for i in range(1, 65)]), 6) AS d
               FROM e CROSS JOIN c1 c),
        a2 AS (SELECT vec_id, cid, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
               WHERE rn = 1),
        p AS (SELECT b.vec_id AS id_b, b.cid,
                round(list_sum([a.v[i] * b.v[i] for i in range(1, 65)])
                      / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6) AS cos
              FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id)
        SELECT id_b AS dropped_id, cid, count(*) AS n_dups, max(cos) AS max_cos
        FROM p WHERE cos >= 0.4
        GROUP BY id_b, cid ORDER BY dropped_id""")),

    // ---- SemDeDup with 2-probe assignment (boundary-miss recall) ----
    // Single-assignment SemDeDup misses pairs straddling a cell
    // boundary; assigning each vector to its 2 nearest cells catches a
    // pair in a shared second-choice cell. Measured at gate scale:
    // recall vs the exhaustive cos>=0.4 pair set rises 24/59 -> 49/59
    // for a 3.7x (still n^2/k-bounded) pair space — the knob trades
    // bounded compute for recall, never an all-pairs path.
    "dedup_semantic_probe2" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        semanticDropped(e, probes = 2).orderBy("dropped_id")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
        seeds AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        d1 AS (SELECT e.vec_id, s.cid, e.v,
                 round(list_sum([(e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i]) for i in range(1, 65)]), 6) AS d
               FROM e CROSS JOIN seeds s),
        a1 AS (SELECT vec_id, cid, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
               WHERE rn = 1),
        m1 AS (SELECT cid, i - 1 AS dim, round(avg(v[i]), 9) AS m
               FROM a1, range(1, 65) AS t(i) GROUP BY cid, i),
        c1 AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cid),
        d2 AS (SELECT e.vec_id, c.cid, e.v,
                 round(list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) for i in range(1, 65)]), 6) AS d
               FROM e CROSS JOIN c1 c),
        a2 AS (SELECT vec_id, cid, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
               WHERE rn <= 2),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, min(b.cid) AS cid,
                max(round(list_sum([a.v[i] * b.v[i] for i in range(1, 65)])
                      / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6)) AS cos
              FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
              GROUP BY a.vec_id, b.vec_id)
        SELECT id_b AS dropped_id, min(cid) AS cid, count(*) AS n_dups, max(cos) AS max_cos
        FROM p WHERE cos >= 0.4
        GROUP BY id_b ORDER BY dropped_id""")),

    // ---- segment-level duplication stats (the dup_line_frac signal) ----
    // Whole-doc dedup misses boilerplate repeated INSIDE otherwise-unique
    // documents (headers, navboxes, license blurbs) — the standard
    // curation signal is the fraction of a doc's lines duplicated
    // elsewhere in the corpus (RefinedWeb/CCNet's dup_line_frac). The
    // synthetic corpus has no newlines, so "lines" are fixed 10-word
    // segments. Shape: explode segments, ONE groupBy (hash, source) that
    // collapses the corpus to distinct (segment, source) counts, then a
    // hash-partitioned window to get corpus-wide occurrence — the second
    // shuffle moves only distinct segment hashes, not the corpus. At
    // 100 TB both shuffles are keyed by content hash: uniform,
    // AQE-splittable, no pair space anywhere.
    "dedup_segment_stats" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "documents")
          .where(length(col("text")) > 0)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), col("source"), col("w"),
            explode(expr("sequence(0, size(w) - 1, 10)")).as("i"))
          .selectExpr("doc_id", "source",
            "md5(concat_ws(' ', slice(w, i + 1, 10))) AS h")
          .groupBy("h", "source")
          .agg(count(lit(1)).as("n_hs"), sum(col("doc_id")).as("id_sum"))
          .withColumn("n_occ", sum(col("n_hs")).over(Window.partitionBy("h")))
          .groupBy("source")
          .agg(sum(col("n_hs")).as("n_segs"),
            sum(when(col("n_occ") > 1, col("n_hs")).otherwise(0L)).as("n_dup_segs"),
            sum(col("id_sum")).as("id_checksum"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
          FROM documents WHERE length(text) > 0),
        c AS (SELECT doc_id, source, w, unnest(range(0, len(w), 10)) AS i FROM d),
        s AS (SELECT doc_id, source,
            md5(array_to_string(w[i + 1 : least(i + 10, len(w))], ' ')) AS h
          FROM c),
        g AS (SELECT h, source, count(*) AS n_hs, sum(doc_id) AS id_sum
          FROM s GROUP BY h, source),
        t AS (SELECT h, source, n_hs, id_sum,
            sum(n_hs) OVER (PARTITION BY h) AS n_occ FROM g)
        SELECT source, CAST(sum(n_hs) AS BIGINT) AS n_segs,
          CAST(sum(CASE WHEN n_occ > 1 THEN n_hs ELSE 0 END) AS BIGINT) AS n_dup_segs,
          CAST(sum(id_sum) AS BIGINT) AS id_checksum
        FROM t GROUP BY source ORDER BY source""")),

    // ---- span-level dedup REMOVAL (ExactSubstr-style rewrite) ----
    // dedup_segment_stats only measures intra-doc duplication; this
    // entry acts on it — the Lee et al. ("Deduplicating Training Data
    // Makes Language Models Better", arXiv:2107.06499) policy at
    // segment granularity: every 10-word segment keeps exactly its
    // FIRST corpus-wide occurrence (min (doc_id, position)), later
    // occurrences are cut and each document's text is rebuilt from its
    // surviving segments in order. Shape at 100 TB: a row_number window
    // keyed by segment content (uniform hash-like key, AQE-splittable)
    // + a per-doc groupBy to reassemble — two keyed shuffles, no pair
    // space; the reassembly buffer is bounded by one document's length.
    "dedup_span_removal" -> Q(
      (s, dir) => spanRemoval(t(s, dir, "documents")).orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE length(text) > 0),
        c AS (SELECT doc_id, w, unnest(range(0, len(w), 10)) AS i FROM d),
        s AS (SELECT doc_id, i,
                array_to_string(w[i + 1 : least(i + 10, len(w))], ' ') AS seg
              FROM c),
        r AS (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, i) AS rn FROM s),
        tot AS (SELECT doc_id, count(*) AS n_segs FROM s GROUP BY doc_id),
        k AS (SELECT doc_id, count(*) AS n_kept,
                string_agg(seg, ' ' ORDER BY i) AS text_clean
              FROM r WHERE rn = 1 GROUP BY doc_id)
        SELECT t.doc_id, t.n_segs, coalesce(k.n_kept, 0) AS n_kept,
          coalesce(k.text_clean, '') AS text_clean
        FROM tot t LEFT JOIN k USING (doc_id) ORDER BY t.doc_id""")),

    // ---- winnowing fingerprints (local document fingerprinting) ----
    // The MOSS-family member of the dedup toolbox (Schleimer/Wilkerson/
    // Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    // SIGMOD 2003 — public): hash every word 4-gram, then keep the MIN
    // hash of each sliding window of 4 — any shared run of >= 7 words
    // between two docs GUARANTEES a shared fingerprint (the local
    // guarantee MinHash doesn't give: MinHash bounds the MISS
    // PROBABILITY of whole-doc similarity; winnowing detects bounded
    // LOCAL overlap deterministically, e.g. a paragraph lifted into an
    // otherwise different document). Everything per-row until the
    // posting join: gram hashes and window mins fold inside one
    // projection, the inverted-index self-join shuffles only distinct
    // (doc, fingerprint) rows, skewed hot fingerprints split by AQE —
    // word-count shape, scales like dedup_ngram_jaccard's posting join.
    // Hash = first 15 md5 hex chars (60 bits) via the established
    // conv/0x identity so DuckDB computes identical fingerprints.
    "dedup_winnowing" -> Q(
      // minShared = 2 here (noise rejection over the synthetic corpus's
      // common phrases); the guarantee-preserving default is 1 — see
      // winnowingPairs
      (s, dir) => winnowingPairs(t(s, dir, "documents"), minShared = 2)
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (SELECT doc_id,
            [CAST(('0x' || substr(md5(array_to_string(w[i : i+3], ' ')), 1, 15)) AS BIGINT)
             for i in range(1, len(w) - 2)] AS hs
          FROM d WHERE len(w) >= 7),
        f AS (SELECT doc_id,
            list_distinct([list_min(hs[j : j+3]) for j in range(1, len(hs) - 2)]) AS fps
          FROM g),
        p AS (SELECT doc_id, unnest(fps) AS fp FROM f)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS INTEGER) AS n_shared
        FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b""")),

    // ---- incremental dedup: a new batch probed against the corpus ----
    // The production shape full-corpus dedup can't give you: a daily
    // crawl delta is deduped AGAINST the existing corpus, not within
    // itself. The corpus's banded-MinHash buckets are the LSH index (at
    // scale: computed once, persisted, reused every batch — here rebuilt
    // because the gate is stateless); the batch's buckets are tiny and
    // BROADCAST onto it, so the corpus stream is never reshuffled by the
    // probe, and cost per batch is O(|corpus| map + |batch| index work).
    // Exact dups are caught by a content-hash join on the same
    // broadcast-batch shape (also covers docs too short to shingle);
    // near-dups by band collision + exact Jaccard verify at J >= 0.8.
    // Emits each contaminated batch doc with its lowest-id corpus match.
    "dedup_incremental" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val isBatch = col("doc_id") % 10 === 7 // deterministic 10% "delta"
        incrementalDupMatches(docs.where(isBatch), docs.where(!isBatch))
          .orderBy("batch_id")
      },
      Some(IncrementalOracleSql)),

    // ---- leakage-safe train/val split ----
    // Eval leakage through near-duplicates: a random PER-DOCUMENT split
    // puts one copy of a near-dup pair in train and its twin in val, and
    // the held-out benchmark silently measures memorization. The split
    // unit must be the near-dup CLUSTER: every doc in a connected
    // component inherits the component label's deterministic md5 bucket,
    // so near-duplicates can never straddle the split (and the split is
    // a pure function of content — stable across runs, engines, and
    // retries, unlike rand()). Reuses the LSH-verified pair graph and
    // pointer-doubling components (both already the shapes that scale);
    // the component frame is pair-bounded — tiny next to the corpus —
    // and BROADCAST onto the doc table. Singletons fall through the
    // left join and split on their own id, keeping one code path.
    "pipe_leakage_safe_split" -> Q(
      (s, dir) => leakageSafeSplitOf(
        t(s, dir, "documents").select(col("doc_id")),
        lshVerifiedPairs(s, dir).select("id_a", "id_b"),
        idCol = "doc_id", buckets = 10, valBuckets = 2)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $ShingleCteSql,
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, label) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
        SELECT d.doc_id,
          coalesce(c.component, d.doc_id) AS component,
          CASE WHEN CAST(('0x' || substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
               THEN 'train' ELSE 'val' END AS split
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        ORDER BY d.doc_id""")),

    // ---- UMI directional dedup (the UMI-tools network core) ----
    // Sequencing UMIs accumulate 1-mismatch PCR/sequencing errors; the
    // directional rule merges umi a into neighbor b when
    // n(b) >= 2*n(a) - 1. The Hamming-1 edge discovery is the scale
    // trick: each UMI explodes into L masked keys (one position
    // wildcarded), so neighbors meet through a masked-key EQUI-join —
    // O(reads·L) keys, never a pairwise Hamming scan. Fixture: 8 true
    // UMIs over paired base-4 digits (pairwise Hamming >= 2 by
    // construction) with two planted 1-off errors each; the oracle
    // states the merged groups closed-form.
    "dedup_umi" -> Q(
      (s, _) => {
        // true UMI t: digits (2*bit0, 2*bit1, 2*bit2), each doubled ->
        // 6 chars over {0,2}; errors flip position 0 or 2 to '1'
        val parents = s.range(8).selectExpr(
          "concat(repeat(cast((id % 2) * 2 as string), 2), " +
            "repeat(cast(((id div 2) % 2) * 2 as string), 2), " +
            "repeat(cast(((id div 4) % 2) * 2 as string), 2)) AS umi",
          "100 + id AS n")
        val errs = s.range(8).selectExpr(
            "concat('1', repeat(cast((id % 2) * 2 as string), 1), " +
              "repeat(cast(((id div 2) % 2) * 2 as string), 2), " +
              "repeat(cast(((id div 4) % 2) * 2 as string), 2)) AS umi",
            "1 + id % 3 AS n")
          .union(s.range(8).selectExpr(
            "concat(repeat(cast((id % 2) * 2 as string), 2), '1', " +
              "repeat(cast(((id div 2) % 2) * 2 as string), 1), " +
              "repeat(cast(((id div 4) % 2) * 2 as string), 2)) AS umi",
            "2L AS n"))
        val umis = parents.union(errs)
        val masked = umis.selectExpr("umi", "n",
            "explode(transform(sequence(1, length(umi)), j -> " +
              "concat(substring(umi, 1, j - 1), '*', substring(umi, j + 1)))) AS mk")
        val edges = masked.alias("a").join(masked.alias("b"),
            org.apache.spark.sql.functions.col("a.mk") === org.apache.spark.sql.functions.col("b.mk") &&
              org.apache.spark.sql.functions.col("a.umi") =!= org.apache.spark.sql.functions.col("b.umi"))
          .selectExpr("a.umi AS umi", "a.n AS n", "b.umi AS nb", "b.n AS nb_n")
        val adopted = umis.alias("u")
          .join(edges.where("nb_n >= 2 * n - 1"), Seq("umi", "n"), "left")
          .groupBy(col("umi"), col("n"))
          .agg(max(when(col("nb").isNotNull, struct(col("nb_n"), col("nb")))).as("best"))
          .selectExpr("umi", "n", "coalesce(best.nb, umi) AS parent")
        adopted.groupBy(col("parent"))
          .agg(count(lit(1)).cast("long").as("n_members"), sum(col("n")).as("n_reads"))
          .orderBy("parent")
      },
      Some("""WITH g AS (SELECT t,
            repeat(CAST((t % 2) * 2 AS VARCHAR), 2) ||
            repeat(CAST(((t // 2) % 2) * 2 AS VARCHAR), 2) ||
            repeat(CAST(((t // 4) % 2) * 2 AS VARCHAR), 2) AS umi
          FROM range(0, 8) x(t))
        SELECT umi AS parent, CAST(3 AS BIGINT) AS n_members,
          CAST(100 + t + (1 + t % 3) + 2 AS BIGINT) AS n_reads
        FROM g ORDER BY parent""")),

    // ---- method-agreement audit: MinHash J>=0.8 vs SimHash dist<=3 ----
    // The calibration question every dedup deployment answers before
    // trusting a cheaper sketch: how much of the shingle-Jaccard pair
    // set does the 32-bit SimHash Hamming screen recover, and what does
    // it add? Both pair sets are computed on the same bounded audit
    // slice (doc_id < 300 — the dedup_simhash_pairs convention, since
    // the SimHash side is an all-pairs oracle shape), full-outer-joined
    // on the pair key, and collapsed to one agreement row: pair counts,
    // the intersection, and pair-set Jaccard in micro units. At 100 TB
    // the same audit runs on a SAMPLED slice by construction — the
    // slice predicate is the only corpus-sized touch. Denominator
    // guarded with greatest(_, 1): an empty union must yield 0, not a
    // divide-by-zero abort under ANSI.
    "dedup_method_agreement" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.registerAll(s)
        val docs = t(s, dir, "documents").where(col("doc_id") < 300)
        val mh = lshVerifiedPairsOf(shingleSets(docs))
          .select(col("id_a"), col("id_b"), lit(1L).as("in_mh"))
        val sims = docs.select(col("doc_id"),
          expr("graft_simhash32(array_distinct(split(text, ' ')))").as("simhash"))
        val sp = sims.select(col("doc_id").as("id_a"), col("simhash").as("ha"))
          .join(sims.select(col("doc_id").as("id_b"), col("simhash").as("hb")),
            col("id_a") < col("id_b"))
          .where(bit_count(expr("ha ^ hb")) <= 3)
          .select(col("id_a"), col("id_b"), lit(1L).as("in_sh"))
        mh.join(sp, Seq("id_a", "id_b"), "full_outer")
          .agg(sum(coalesce(col("in_mh"), lit(0L))).as("n_minhash"),
            sum(coalesce(col("in_sh"), lit(0L))).as("n_simhash"),
            sum(coalesce(col("in_mh"), lit(0L)) *
              coalesce(col("in_sh"), lit(0L))).as("n_both"))
          .selectExpr("n_minhash", "n_simhash", "n_both",
            """1000000 * n_both
               div greatest(n_minhash + n_simhash - n_both, 1) AS agree_micro""")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 300),
        sh AS (SELECT doc_id,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in range(1, len(w) - 1)]) AS sh
          FROM w WHERE len(w) >= 3),
        mh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.sh, b.sh))
            >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        d AS (SELECT doc_id,
            [CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
             for tok in list_distinct(string_split(text, ' '))] AS hs
          FROM documents WHERE doc_id < 300),
        si AS (SELECT doc_id,
            list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1
                        THEN 1 ELSE -1 END for h in hs]) >= 0
                      THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
                 for j in range(0, 32)]) AS simhash
          FROM d),
        sp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM si a JOIN si b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        u AS (SELECT
            CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_mh,
            CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_sh
          FROM mh m FULL OUTER JOIN sp p
            ON m.id_a = p.id_a AND m.id_b = p.id_b)
        SELECT CAST(sum(in_mh) AS BIGINT) AS n_minhash,
          CAST(sum(in_sh) AS BIGINT) AS n_simhash,
          CAST(sum(in_mh * in_sh) AS BIGINT) AS n_both,
          CAST(1000000 * sum(in_mh * in_sh)
            // greatest(sum(in_mh) + sum(in_sh) - sum(in_mh * in_sh), 1)
            AS BIGINT) AS agree_micro
        FROM u"""))
  )
}
