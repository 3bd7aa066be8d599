package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public, DataFrame-in / DataFrame-out entry points for the corpus
  * operators the gate queries exercise over the test tables — the API a
  * user calls on their OWN tables. Each delegates to the same
  * implementation the oracle-checked `SparkEntry` entries run, so the
  * correctness gate covers this surface too; only column adaptation
  * happens here.
  *
  * All operators are shuffle-keyed and driver-light by construction
  * (see SCALE.md): near-dup candidate generation is banded LSH (no
  * pair space), components converge in O(log diameter) keyed-join
  * rounds, interval merge is a window sweep with optional within-key
  * range-bucketing.
  */
object CorpusOps {

  /** The dedup/component operators key their shuffles and labels on
    * long ids; a non-integral id column would cast to null and silently
    * corrupt results (every row in one null partition, joins matching
    * nothing) — fail loudly instead. */
  private def requireIntegralId(df: DataFrame, idCol: String, method: String): Unit = {
    import org.apache.spark.sql.types._
    // resolve the way Spark's analyzer does by default: case-insensitive
    val field = df.schema.find(_.name.equalsIgnoreCase(idCol)).getOrElse(
      throw new IllegalArgumentException(
        s"CorpusOps.$method: no column '$idCol' in [${df.columns.mkString(", ")}]"))
    val ok = field.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.scale == 0 && d.precision <= 18 // lossless in a long
      case _ => false
    }
    require(ok,
      s"CorpusOps.$method requires an integral id column; '$idCol' is " +
        s"${field.dataType.simpleString}. Derive one first (e.g. xxhash64 of a " +
        "string key, or monotonically_increasing_id with a join back).")
  }

  /** Verified near-duplicate pairs over 3-word shingles via
    * MinHash(32)+LSH(16x2) candidate banding and exact verification.
    * Input: any frame with an integral id column and a string text
    * column. Output: (id_a, id_b, inter, uni) with Jaccard >= 4/5,
    * integer-exact (`5*inter >= 4*uni`).
    */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    requireIntegralId(docs, idCol, "nearDupPairs")
    graft.queries.Dedup.lshVerifiedPairsOf(
      graft.queries.Dedup.shingleSets(
        docs.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("text"))))
  }

  /** Containment pairs — the near-superset detector Jaccard misses: a
    * doc lifted whole into a 10x longer one has J ~ 0.1 but containment
    * ~ 1.0 (Broder's resemblance-vs-containment distinction). Pairs
    * whose 3-word-shingle containment inter / min(|A|, |B|) reaches
    * `minPct`/100, integer-exact. Same bounded posting-join shape as
    * [[nearDupPairs]]' verification; see SCALE.md on hot-shingle skew.
    * Output: (id_a, id_b, inter, sz_a, sz_b), id_a < id_b. */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", minPct: Int = 90): DataFrame = {
    requireIntegralId(docs, idCol, "containmentPairs")
    require(minPct >= 1 && minPct <= 100,
      s"CorpusOps.containmentPairs: minPct ($minPct) must be in [1, 100]")
    graft.queries.Dedup.containmentPairsOf(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")), minPct)
  }

  /** Edit-distance-verified near-dup pairs — the exact-confirmation
    * stage of a fuzzy-dedup pipeline. Shingle-posting candidates are
    * verified by `100 * levenshtein(a, b) <= maxPct * max(len)`,
    * integer-exact; the length-gap prune and the banded (3-arg)
    * Levenshtein keep the quadratic DP off pairs that cannot qualify
    * without changing the kept set. Output:
    * (id_a, id_b, dist, len_max), id_a < id_b. */
  def editDistancePairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", maxPct: Int = 20): DataFrame = {
    requireIntegralId(docs, idCol, "editDistancePairs")
    require(maxPct >= 1 && maxPct <= 100,
      s"CorpusOps.editDistancePairs: maxPct ($maxPct) must be in [1, 100]")
    graft.queries.Dedup.editVerifiedPairsOf(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")), maxPct)
  }

  /** Zipf/Heaps corpus profile: least-squares fit of
    * ln(freq) ~ a + slope * ln(rank) over the `topK` most frequent
    * tokens (a healthy natural corpus sits near slope -1; boilerplate
    * or templated spam pushes it away), plus vocab / total-token
    * counts. One row: (n_terms, vocab, total_tokens, sx, sy, sxy, sxx,
    * zipf_slope). */
  def zipfProfile(docs: DataFrame, textCol: String = "text",
                  topK: Int = 1000): DataFrame = {
    require(docs.columns.contains(textCol),
      s"CorpusOps.zipfProfile: no column '$textCol'")
    require(topK >= 2, s"CorpusOps.zipfProfile: topK ($topK) must be >= 2")
    graft.queries.TextOps.zipfProfile(docs, textCol, topK)
  }

  /** Threshold-sweep calibration of a score-based filter: for every
    * candidate cut t (bucket floors of `scoreCol`), the confusion
    * counts of "keep if score >= t" against the boolean `labelCol` —
    * the table that turns threshold-picking from a guess into a read.
    * `bucket` bounds the sweep frame (range/bucket rows) independent
    * of corpus size. Output: (threshold, tp, fp, fn, tn),
    * integer-exact; precision/recall are display-time divisions. */
  def thresholdSweep(scored: DataFrame, scoreCol: String = "score",
                     labelCol: String = "label", bucket: Long = 1L): DataFrame = {
    require(scored.columns.contains(scoreCol) && scored.columns.contains(labelCol),
      s"CorpusOps.thresholdSweep: need columns '$scoreCol' and '$labelCol'")
    graft.queries.PipelineOps.thresholdSweepOf(scored, scoreCol, labelCol, bucket)
  }

  /** Winnowed-fingerprint pairs (SIGMOD'03 winnowing): docs sharing >=
    * `minShared` fingerprints over word `gramWidth`-grams with window
    * `window`. Unlike [[nearDupPairs]] (whole-doc similarity with a
    * probabilistic miss bound), this DETERMINISTICALLY catches local
    * overlap: any common run of `gramWidth + window - 1` words
    * guarantees a shared fingerprint — the lifted-paragraph case. That
    * guarantee holds at the default `minShared = 1` (a minimal run can
    * collapse to ONE distinct fingerprint); raise the threshold only to
    * trade it for noise rejection on short common phrases.
    * Output: (id_a, id_b, n_shared).
    */
  def winnowingPairs(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", gramWidth: Int = 4,
                     window: Int = 4, minShared: Int = 1): DataFrame = {
    requireIntegralId(docs, idCol, "winnowingPairs")
    graft.queries.Dedup.winnowingPairs(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")),
      gramWidth, window, minShared)
  }

  /** Connected components of an undirected pair list (first two columns
    * = edge endpoints): returns (node, label) with label = min reachable
    * id. Min-label propagation with pointer doubling — O(log diameter)
    * rounds, each a keyed shuffle; converges or throws, never returns
    * partial labels.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val c = pairs.columns
    requireIntegralId(pairs, c(0), "connectedComponents")
    requireIntegralId(pairs, c(1), "connectedComponents")
    graft.queries.Dedup.connectedComponents(
      pairs.select(col(c(0)).cast("long"), col(c(1)).cast("long")))
  }

  /** Keep the best row of each near-dup cluster (the production
    * keep-policy): clusters = connected components over `pairs` (two
    * id columns, e.g. the output of [[nearDupPairs]]); within each
    * cluster the row maximizing `qualityCol` wins, ties broken by
    * lowest id; docs in no pair are their own cluster and always kept.
    * Returns the surviving rows with all their columns.
    */
  def canonicalPerCluster(docs: DataFrame, pairs: DataFrame,
                          qualityCol: String,
                          idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireIntegralId(docs, idCol, "canonicalPerCluster")
    val comps = connectedComponents(pairs)
      .select(col("node").as(idCol), col("label").as("__component"))
    docs.join(comps, Seq(idCol), "left")
      .withColumn("__component",
        coalesce(col("__component"), col(idCol).cast("long")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__component")
          .orderBy(col(qualityCol).desc, col(idCol).asc)))
      .where(col("__rn") === 1)
      .drop("__component", "__rn")
  }

  /** Leakage-safe train/val split: every near-dup CLUSTER (connected
    * components over `pairs`, e.g. the output of [[nearDupPairs]]) lands
    * wholly in one split, so a benchmark held out from training never
    * contains a near-duplicate of a training doc. The assignment is a
    * deterministic md5 bucket of the cluster label — a pure function of
    * content, stable across runs, engines, and task retries (`rand()`
    * per doc is the leakage bug this operator exists to fix). Of
    * `buckets` hash buckets the last `valBuckets` go to 'val', the rest
    * to 'train'; docs in no pair split on their own id. Returns `docs`
    * columns plus (component, split).
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id", buckets: Int = 10,
                       valBuckets: Int = 2): DataFrame = {
    requireIntegralId(docs, idCol, "leakageSafeSplit")
    val pc = pairs.columns
    requireIntegralId(pairs, pc(0), "leakageSafeSplit")
    requireIntegralId(pairs, pc(1), "leakageSafeSplit")
    require(buckets >= 2 && valBuckets >= 1 && valBuckets < buckets,
      s"CorpusOps.leakageSafeSplit: need 1 <= valBuckets < buckets >= 2, " +
        s"got buckets=$buckets valBuckets=$valBuckets")
    require(!docs.columns.exists(c => c.equalsIgnoreCase("component") ||
        c.equalsIgnoreCase("split")),
      "CorpusOps.leakageSafeSplit: docs already has a 'component' or 'split' column")
    graft.queries.Dedup.leakageSafeSplitOf(
      docs, pairs.select(col(pc(0)).cast("long"), col(pc(1)).cast("long")),
      idCol, buckets, valBuckets)
  }

  /** Count-Min-Sketch heavy hitters: the values of `valueCol` whose
    * occurrence count reaches `threshold`, found with sketch state of
    * fixed size `depth` x `width` regardless of value cardinality. The
    * sketch never under-counts, so no heavy hitter is missed; screened
    * candidates are then exact-counted, so the reported counts carry no
    * sketch error. Returns (`valueCol`, est, cnt) — est is the sketch
    * estimate (>= cnt; the gap is the collision mass, a direct width
    * diagnostic). Size `width` >> distinct-values/threshold so the
    * screen actually prunes.
    */
  def heavyHitters(values: DataFrame, valueCol: String, threshold: Long,
                   depth: Int = 3, width: Int = 2048): DataFrame = {
    require(values.columns.exists(_.equalsIgnoreCase(valueCol)),
      s"CorpusOps.heavyHitters: no column '$valueCol' in [${values.columns.mkString(", ")}]")
    require(!Seq("est", "cnt").exists(_.equalsIgnoreCase(valueCol)),
      "CorpusOps.heavyHitters: valueCol collides with an output column (est, cnt)")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    graft.queries.TextOps.cmsHeavyHitters(values, valueCol, threshold, depth, width)
  }

  /** BM25 top-k retrieval over a whitespace-tokenized text column —
    * Okapi scoring (default k1=1.2, b=0.75), top `k` rows by
    * (score desc, id asc). The retrieval shape a curation pipeline
    * needs beyond exact n-gram decontamination: "which corpus docs
    * match this query". The corpus is exploded once and filtered to
    * the query's terms before any shuffle, so aggregate state is
    * bounded by |matching docs| x |terms|; per-term contributions are
    * summed as integer micro-points, so the score is shuffle-order
    * independent (see TextOps.bm25TopK). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    Seq(idCol, textCol).foreach { c =>
      require(docs.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.bm25TopK: no column '$c' in [${docs.columns.mkString(", ")}]")
    }
    require(terms.nonEmpty, "CorpusOps.bm25TopK: empty term list")
    require(terms.forall(t => t.nonEmpty && !t.contains("'")),
      "CorpusOps.bm25TopK: terms must be non-empty and quote-free")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1,
      s"BM25 parameters out of range: k1=$k1 (must be > 0), b=$b (must be in [0, 1])")
    graft.queries.TextOps.bm25TopK(docs, terms, k, idCol, textCol, k1, b)
  }

  /** Corpus-trained bigram-LM scoring (the CCNet-style perplexity
    * filter): add-one-smoothed bigram model trained on `docs` itself,
    * each doc scored by its mean negative log-likelihood. Returns
    * (`idCol`, n_bigrams, nll); docs with fewer than two tokens are
    * omitted (no bigram to score). Per-bigram -ln P is rounded to
    * integer micro-nats and summed as BIGINT, so the score is
    * shuffle-order independent and engine-reproducible (see
    * TextOps.bigramLmNll for the scale shape). */
  def bigramLmNll(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    Seq(idCol, textCol).foreach { c =>
      require(docs.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.bigramLmNll: no column '$c' in [${docs.columns.mkString(", ")}]")
    }
    require(!Seq("n_bigrams", "nll").exists(_.equalsIgnoreCase(idCol)),
      "CorpusOps.bigramLmNll: idCol collides with an output column (n_bigrams, nll)")
    graft.queries.TextOps.bigramLmNll(docs, idCol, textCol)
  }

  /** fastText-shaped model-based quality scoring: a linear classifier
    * over hashed bigram features. `weights` is the trained model as a
    * (gram string, weight bigint) table — vocabulary-bounded, so it
    * BROADCASTS; the corpus explodes its bigrams once, looks weights up
    * on the broadcast, and re-aggregates per doc (map-side partial agg
    * collapses each doc to ~1 shuffled row). Integer weights keep the
    * score exactly reproducible regardless of shuffle order — the
    * lineage-stability property a curation filter needs (a float dot
    * product would be summation-order-dependent). Unknown grams score
    * 0; docs with < 2 tokens score 0 with n_feats = 0 (explode_outer
    * keeps them). Returns (idCol, n_feats, score_raw, keep) with
    * keep = score_raw >= threshold. */
  def qualityScore(docs: DataFrame, weights: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   threshold: Long = 0L): DataFrame = {
    Seq(idCol, textCol).foreach { c =>
      require(docs.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.qualityScore: no column '$c' in [${docs.columns.mkString(", ")}]")
    }
    Seq("gram", "weight").foreach { c =>
      require(weights.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.qualityScore: weights table needs (gram, weight), got [${weights.columns.mkString(", ")}]")
    }
    val grams = docs
      .select(col(idCol).as("qs_id"), split(col(textCol), " ").as("w"))
      .select(col("qs_id"), explode_outer(
        when(size(col("w")) >= 2, expr(graft.queries.PipelineOps.gramExpr(2)))
          .otherwise(expr("cast(array() as array<string>)"))).as("gram"))
    grams
      .join(broadcast(weights.select(col("gram"),
        col("weight").cast("long").as("weight"))), Seq("gram"), "left")
      .groupBy("qs_id")
      .agg(count(col("gram")).as("n_feats"),
        coalesce(sum(col("weight")), lit(0L)).as("score_raw"))
      .select(col("qs_id").as(idCol), col("n_feats"), col("score_raw"),
        (col("score_raw") >= threshold).as("keep"))
  }

  /** Token-budget selection: keep the best rows by `scoreCol` (DESC,
    * ties broken by lowest id) until `budgetTokens` whitespace tokens of
    * `textCol` are spent — the "best data under budget" cut after
    * scoring. The budget-crossing row is the last one kept; rows are
    * returned with all their columns. The global quality-ordered running
    * sum is a two-level distributed prefix sum (per-(score, id-range)
    * band totals prefix-summed on the small band frame, broadcast back,
    * within-band windows), never a single-partition global window — so
    * the cut parallelizes at corpus scale. `scoreCol` must be non-null;
    * score cardinality drives band granularity (a constant score
    * degrades to id-range bands of `1 << 20` rows each, still bounded).
    */
  def selectUnderTokenBudget(docs: DataFrame, budgetTokens: Long,
                             scoreCol: String, idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    requireIntegralId(docs, idCol, "selectUnderTokenBudget")
    Seq(scoreCol, textCol).foreach { c =>
      require(docs.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.selectUnderTokenBudget: no column '$c' in [${docs.columns.mkString(", ")}]")
    }
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(!docs.columns.exists(_.equalsIgnoreCase("__tb_tokens")),
      "CorpusOps.selectUnderTokenBudget: docs already has a '__tb_tokens' column")
    graft.queries.PipelineOps.tokenBudgetCore(
        docs.withColumn("__tb_tokens", size(split(col(textCol), " ")).cast("long")),
        idCol, scoreCol, "__tb_tokens",
        budgetTokens = Some(budgetTokens), budgetPermille = None)
      .drop("__tb_tokens")
  }

  /** Incremental dedup — the daily-delta shape: drop `batch` rows that
    * duplicate a `corpus` doc, exactly (content-hash equality, covers
    * docs too short to shingle) or nearly (MinHash-band collision +
    * exact Jaccard >= 0.8 over 3-word shingles). Returns the CLEAN
    * batch rows with all their columns. The batch side is broadcast
    * onto the corpus stream, so the corpus is never reshuffled —
    * per-delta cost is a map over the corpus plus index work on the
    * batch.
    */
  def dedupAgainstCorpus(batch: DataFrame, corpus: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    requireIntegralId(batch, idCol, "dedupAgainstCorpus")
    requireIntegralId(corpus, idCol, "dedupAgainstCorpus")
    def adapt(df: DataFrame) = df.select(
      col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    val dups = graft.queries.Dedup
      .incrementalDupMatches(adapt(batch), adapt(corpus))
      .select(col("batch_id").as(idCol))
    batch.join(dups, Seq(idCol), "left_anti")
  }

  /** Span-level dedup REMOVAL (the ExactSubstr policy of Lee et al.
    * arXiv:2107.06499 at fixed segment granularity): every
    * `segWords`-word segment keeps exactly its first corpus-wide
    * occurrence (min (id, position)); later occurrences are cut and
    * each document is rebuilt from its surviving segments in order —
    * the boilerplate-stripping step whole-doc dedup can't do. Output:
    * (idCol, n_segs, n_kept, text_clean); a doc emptied entirely keeps
    * its row with n_kept = 0. Two keyed shuffles, no pair space.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           segWords: Int = 10): DataFrame = {
    requireIntegralId(docs, idCol, "removeDuplicateSpans")
    graft.queries.Dedup.spanRemoval(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")), segWords)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Semantic dedup (SemDeDup, Abbas et al. arXiv:2303.09540): drop
    * rows whose embedding has cosine >= `minCosine` to a lower-id row
    * in the same k-means cell, returning the SURVIVING rows with all
    * their columns. The cluster partitioning bounds the pair space —
    * pairs are computed within a cell only (sum |cell|^2 ~= n^2/k), so
    * pick `k` ~ corpusSize / targetCellSize at scale; no all-pairs path
    * exists. Clustering is the deterministic 2-round Lloyd shared with
    * the ANN operators (seeds = the k lowest ids). `vecCol` is any
    * numeric array column; ids must be integral ([[requireIntegralId]]).
    * `probes` > 1 assigns each vector to its `probes` nearest cells —
    * the boundary-miss recall knob (pairs straddling a cell boundary
    * still meet in a shared second-choice cell) at a ~probes^2-bounded
    * pair-space cost.
    */
  def semanticDedup(embeddings: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding", k: Int = 8,
                    minCosine: Double = 0.9, probes: Int = 1): DataFrame = {
    requireIntegralId(embeddings, idCol, "semanticDedup")
    require(k >= 1, s"semanticDedup: k ($k) must be >= 1")
    val e = embeddings.select(
      col(idCol).cast("long").as("vec_id"),
      expr(s"transform(`${vecCol.replace("`", "``")}`, x -> cast(x as double))").as("v"))
    val dropped = graft.queries.Dedup.semanticDropped(e, k, minCosine, probes)
      .select(col("dropped_id").as(idCol))
    embeddings.join(dropped, Seq(idCol), "left_anti")
  }

  /** Drop train documents that share a `gramWidth`-gram with the eval
    * set (benchmark decontamination), returning the CLEAN train rows
    * with all their columns. Physical plan is the 100 TB one: an exact
    * Bloom filter over the eval grams is broadcast and applied
    * map-side — the train corpus is never shuffled — and only the
    * surviving ~fpp fraction reaches the exact verify join, so the
    * answer is exact (no false negatives exist; false positives die in
    * the verify join).
    */
  def bloomDecontaminate(train: DataFrame, evalDocs: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         gramWidth: Int = 5,
                         expectedEvalGrams: Long = 1000L * 1000L,
                         fpp: Double = 0.01): DataFrame = {
    val contaminated = graft.queries.PipelineOps.bloomContaminated(
      train = train.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      evalDocs = evalDocs.select(col(textCol).as("text")),
      gramWidth = gramWidth, keep = Seq("doc_id"),
      expectedEvalGrams = expectedEvalGrams, fpp = fpp)
    train.join(contaminated.select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Merge overlapping-or-touching intervals per key (bedtools merge).
    * Input columns: key `chrom`, bounds `s`/`e` (long). Output:
    * (chrom, region_start, region_end, n_intervals). With
    * `bucketWidth = Some(w)` the sweep partitions by (chrom, s div w)
    * and a second sweep stitches bucket-boundary regions — same answer
    * (merge is associative; property-checked in IntervalOpsSpec),
    * parallel WITHIN a key instead of bounded by key count.
    */
  /** Deterministic weighted sampling: keep each row with probability
    * `probCol` (clamped to [0, 1]) — the quality-weighted downsampling
    * step. The keep decision is a pure function of the id (md5-derived
    * unit uniform vs the row's probability), so task retries and
    * speculative execution can never double- or drop-count a row —
    * `rand()` cannot promise that, and at 1000 executors retries are
    * routine, not rare. Returns the kept rows with all their columns.
    */
  def weightedSample(df: DataFrame, probCol: String,
                     idCol: String = "doc_id"): DataFrame = {
    requireIntegralId(df, idCol, "weightedSample")
    val id = s"`${idCol.replace("`", "``")}`"
    val p = s"`${probCol.replace("`", "``")}`"
    df.where(expr(
      s"""cast(conv(substr(md5(cast($id as string)), 1, 8), 16, 10) as bigint) % 1000000
          < cast(greatest(0D, least(1D, cast($p as double))) * 1000000 as bigint)"""))
  }

  /** Distance from each `a` interval to its nearest same-chrom `b`
    * interval (bedtools closest): 0 when overlapping or touching, null
    * when the chrom has no `b` feature. Input columns on both frames:
    * key `chrom`, bounds `s`/`e` (long). Output: (chrom, s, e, dist),
    * one row per `a` row. Join-free — one union sorted per chrom and
    * two window passes (see SCALE.md); property-checked against brute
    * force in IntervalOpsSpec.
    */
  def closestFeatures(a: DataFrame, b: DataFrame): DataFrame =
    graft.queries.Relational.closestSweep(
      a.select(col("chrom"), col("s"), col("e")),
      b.select(col("chrom"), col("s"), col("e")))

  /** A \ B over interval SETS per chrom (bedtools subtract, summarized):
    * covered A span, surviving span, and the count of maximal surviving
    * fragments. Input columns on both frames: `chrom`, `s`, `e` (long).
    * Join-free coverage-algebra sweep; property-checked against brute
    * force in IntervalOpsSpec. */
  def subtractIntervals(a: DataFrame, b: DataFrame): DataFrame =
    graft.queries.Relational.subtractSweep(
      a.select(col("chrom"), col("s"), col("e")),
      b.select(col("chrom"), col("s"), col("e")))

  /** Keep at most `k` rows per `keyCol` (a source/domain quota),
    * best-first by (`orderCol` DESC, `idCol` ASC). Returns the kept
    * rows with all input columns. Runs as a two-level salted top-K so
    * one dominant key never serializes into a single sort task —
    * result provably equals the single-window rank (the
    * pipe_source_cap oracle). */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String, k: Int,
                idCol: String = "doc_id", salts: Int = 8): DataFrame = {
    requireIntegralId(df, idCol, "capPerKey")
    Seq(keyCol, orderCol).foreach { c =>
      require(df.columns.exists(_.equalsIgnoreCase(c)),
        s"CorpusOps.capPerKey: no column '$c' in [${df.columns.mkString(", ")}]")
    }
    require(k > 0 && salts > 0, "CorpusOps.capPerKey: k and salts must be positive")
    graft.queries.PipelineOps.capPerKeyCore(df, keyCol, orderCol, idCol, k, salts)
  }

  /** DSIR-style importance weights (Xie et al., arXiv:2302.03169):
    * per-doc mean target-vs-raw unigram log-likelihood ratio, where
    * `isTarget` marks the rows whose token distribution defines the
    * target. Output: (idCol, n_tokens, score, keep) — positive score =
    * looks more like the target. Docs with no non-empty token are
    * absent (no features to score). */
  def dsirWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(docs.columns.exists(_.equalsIgnoreCase(textCol)),
      s"CorpusOps.dsirWeights: no column '$textCol' in [${docs.columns.mkString(", ")}]")
    graft.queries.PipelineOps.dsirWeightsCore(docs, isTarget, idCol, textCol)
  }

  /** CCNet-style perplexity terciles over the corpus-trained bigram LM:
    * (bucket head|middle|tail, n_docs, min_nll, max_nll). Docs too
    * short for a bigram are absent, like [[bigramLmNll]]. */
  def perplexityBuckets(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(docs.columns.exists(_.equalsIgnoreCase(textCol)),
      s"CorpusOps.perplexityBuckets: no column '$textCol' in [${docs.columns.mkString(", ")}]")
    graft.queries.TextOps.perplexityBuckets(docs, idCol, textCol)
  }

  def mergeIntervals(intervals: DataFrame,
                     bucketWidth: Option[Long] = None): DataFrame = {
    val iv = intervals.select(col("chrom"), col("s"), col("e"))
      .withColumn("weight", lit(1L))
    val first = graft.queries.Relational.mergeSweep(iv, bucketWidth)
    bucketWidth match {
      case None => first
      case Some(_) => graft.queries.Relational.mergeSweep(
        first.selectExpr("chrom", "region_start AS s", "region_end AS e",
          "n_intervals AS weight"), bucketWidth = None)
    }
  }

  /** Corpus novelty curve: per document, the fraction of its distinct
    * word `n`-grams NOT seen in any lower-id document (first owner =
    * min id per gram) — the audit behind "is this crawl adding
    * anything"; a feed whose novelty decays to ~0 is re-serving known
    * content. One gram-keyed aggregation (map-side partial min) plus a
    * posting rejoin, bounded by distinct grams. Output: (`idCol`,
    * n_grams, n_novel, novelty). */
  def noveltyCurve(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 3): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"CorpusOps.noveltyCurve: need columns '$idCol' and '$textCol'")
    require(n >= 1, s"CorpusOps.noveltyCurve: n ($n) must be >= 1")
    graft.queries.PipelineOps.ngramNoveltyCore(docs, idCol, textCol, n)
  }

  /** Cross-key duplication matrix: near-dup `pairs` (two id columns,
    * e.g. from [[nearDupPairs]]) lifted to unordered (`keyCol`,
    * `keyCol`) cells with pair counts — the audit separating one feed
    * mirroring another from within-source boilerplate. Output:
    * (src_a, src_b, n_pairs), src_a <= src_b. */
  def dupSourceMatrix(docs: DataFrame, pairs: DataFrame,
                      idCol: String = "doc_id",
                      keyCol: String = "source"): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(keyCol),
      s"CorpusOps.dupSourceMatrix: need columns '$idCol' and '$keyCol'")
    val pc = pairs.columns
    require(pc.length >= 2, "CorpusOps.dupSourceMatrix: pairs needs two id columns")
    graft.queries.Dedup.dupSourceMatrixCore(
      pairs.select(col(pc(0)).as("id_a"), col(pc(1)).as("id_b")),
      docs, idCol, keyCol)
  }
}
