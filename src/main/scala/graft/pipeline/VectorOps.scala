package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, DataFrame-in / DataFrame-out similarity search over an
  * embedding column (`array<float>` or `array<double>`) — the API a
  * user calls on their OWN vector tables. The PQ machinery here is THE
  * implementation the oracle-checked `ann_pq_adc` / `ann_ivfpq_topk`
  * gate entries run (graft.queries.Similarity delegates to
  * [[pqMachinery]]), so the correctness gate covers this code path.
  *
  * Scale contract (see SCALE.md): the corpus side never shuffles — the
  * query set broadcasts (brute force), or the probe is an equi-join on
  * a cell key (IVF), or the scan folds a broadcast LUT over 1-byte
  * codes (PQ) — and the only wide operation is the per-query top-k
  * window.
  */
object VectorOps {

  /** Backtick-quote a user-supplied column name for splicing into a SQL
    * expression string (names with spaces/dots/hyphens; embedded
    * backticks doubled per the SQL rule). */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** All user-supplied names resolve as LITERAL column names (backtick
    * semantics) — consistently across idCol/vecCol/cellCol; a dotted
    * name is a column called "a.b", not nested-field access. */
  private def asVec(df: DataFrame, idCol: String, vecCol: String,
                    extra: Seq[(String, String)] = Nil): DataFrame =
    df.select(col(q(idCol)).cast("long").as("__id") +:
      expr(s"transform(${q(vecCol)}, x -> cast(x as double))").as("__v") +:
      extra.map { case (c, a) => col(q(c)).as(a) }: _*)

  /** Codegen'd kernel (PipelineKernels.cosine) — identical left-to-right
    * accumulation to the HOF formula it replaced, so every facade's
    * ranking values are unchanged; the interpreted-lambda cost in the
    * per-candidate scoring loop is gone. */
  private val Cos = "graft_cosine_sim(__qv, __v)"

  /** EXACT cosine-threshold (radius) search: every (query, corpus)
    * pair with round(cosine, 6) >= `tau`, pairs with equal ids
    * excluded. Output: (q_id, vec_id, cos), ordered. Unlike the top-k
    * family this is not approximate — k-means cells are pruned by the
    * triangle inequality in the unit-normalized space, which provably
    * cannot drop a qualifying pair (losslessness property-checked in
    * RadiusSearchSpec; the ann_radius_prune gate entry hash-matches a
    * brute-force oracle). Scanned fraction behaves like IVF, recall is
    * 1.0 by construction. */
  def radiusSearch(corpus: DataFrame, queries: DataFrame, tau: Double,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(tau > -1.0 && tau <= 1.0, s"radiusSearch: tau ($tau) must be in (-1, 1]")
    graft.queries.Similarity.radiusSearchFrames(
      asVec(corpus, idCol, vecCol).select(col("__id").as("vec_id"), col("__v").as("v")),
      asVec(queries, idCol, vecCol).select(col("__id").as("vec_id"), col("__v").as("v")),
      tau)
  }

  /** Exact cosine top-k: for every query row, the `k` most similar
    * corpus rows. Output: (query id `q_id`, corpus id `id`, `cos`,
    * rank `rn`). The query set is broadcast — size it accordingly
    * (thousands, not millions); the corpus streams through map-side
    * scoring into a per-query top-k.
    *
    * `excludeSelfIds` (default true) drops corpus rows whose id equals
    * the query's id — right when querying a table against itself; pass
    * false when the query table has its own id space, or corpus rows
    * that legitimately share a query id would silently vanish.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     excludeSelfIds: Boolean = true): DataFrame = {
    val c = asVec(corpus, idCol, vecCol)
    val qs = asVec(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__v").as("__qv"))
    rank(c.crossJoin(broadcast(qs)), k, excludeSelfIds)
  }

  /** Matryoshka (MRL) two-stage top-k: score every corpus row on the
    * first `prefixDims` dimensions only, keep the top `candidates` per
    * query, then rerank just those on the full vector. The cheap stage
    * does `prefixDims / dim` of the arithmetic and the expensive stage
    * touches `candidates` rows per query instead of the corpus —
    * embeddings trained matryoshka-style keep most of the ranking
    * signal in the prefix, so recall stays high at a fraction of the
    * cost. Approximate by construction; measure recall against
    * [[bruteForceTopK]] on a sample. Output: (q_id, id, cos, rn). */
  def mrlRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    prefixDims: Int = 16, candidates: Int = 50,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    excludeSelfIds: Boolean = true): DataFrame = {
    require(prefixDims >= 1, s"mrlRerankTopK: prefixDims ($prefixDims) must be >= 1")
    require(candidates >= k,
      s"mrlRerankTopK: candidates ($candidates) must be >= k ($k)")
    graft.functions.GraftFunctions.registerAll(corpus.sparkSession)
    val c = asVec(corpus, idCol, vecCol)
    val qs = asVec(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__v").as("__qv"),
        slice(col("__v"), 1, prefixDims).as("__qp"))
    val w1 = Window.partitionBy(col("__qid"))
      .orderBy(col("pcos").desc, col("__id").asc)
    // stage 1 shuffles only (qid, id, pcos) — wide vectors stay out of
    // the top-C window; stage 2 is a candidate-bounded keyed join back
    val cand = c.select(col("__id"), slice(col("__v"), 1, prefixDims).as("__vp"))
      .crossJoin(broadcast(qs.select(col("__qid"), col("__qp"))))
      .where(if (excludeSelfIds) col("__id") =!= col("__qid") else lit(true))
      .select(col("__qid"), col("__id"),
        expr("round(graft_cosine_sim(__qp, __vp), 6)").as("pcos"))
      .withColumn("rn1", row_number().over(w1))
      .where(col("rn1") <= candidates)
      .select("__qid", "__id")
    rank(cand.join(c, "__id")
      .join(broadcast(qs.select(col("__qid").as("__qid2"), col("__qv"))),
        col("__qid") === col("__qid2")),
      k, excludeSelfIds)
  }

  /** IVF-restricted cosine top-k: rows carry a coarse cell key
    * (`cellCol` — a cluster id, a trained centroid assignment, any
    * partitioner) and each query searches only its own cell, touching
    * |corpus| / cells rows. The probe is an equi-join on the cell key,
    * never a full scan. Recall depends on the cell structure; compose
    * with [[bruteForceTopK]] on a sample to measure it.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              cellCol: String,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              excludeSelfIds: Boolean = true): DataFrame = {
    val c = asVec(corpus, idCol, vecCol, Seq(cellCol -> "__cell"))
    val qs = asVec(queries, idCol, vecCol, Seq(cellCol -> "__qcell"))
      .select(col("__id").as("__qid"), col("__v").as("__qv"), col("__qcell"))
    rank(c.join(broadcast(qs), col("__cell") === col("__qcell")), k, excludeSelfIds)
  }

  /** Product-quantization top-k: each corpus vector compresses to
    * `subspaces` codebook codes — `dim * 4` bytes become `subspaces`
    * bytes — and queries rank by asymmetric distance (their
    * per-subspace distance LUT, broadcast, folded over the code array
    * per row). The codebook is `centroids` centroids per subspace,
    * trained with one Lloyd round from the `centroids` lowest-id
    * corpus vectors. Approximate by design: ranks reflect quantized
    * squared-L2 (`ad`), not exact distances — measure recall against
    * [[bruteForceTopK]] on a sample. The vector length must be
    * divisible by `subspaces` and uniform across corpus and queries
    * (checked per row, loudly).
    *
    * Scale contract: encode and scan are map-only against broadcast
    * codebook/LUT — the corpus never shuffles; only the bounded
    * codebook aggregations and the per-query top-k window are wide.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             subspaces: Int = 8, centroids: Int = 4,
             idCol: String = "vec_id",
             vecCol: String = "embedding",
             excludeSelfIds: Boolean = true): DataFrame = {
    val c = asVec(corpus, idCol, vecCol)
    // probe a non-null row for the dimension (a null embedding must not
    // NPE the probe; null rows then die loudly in the per-row check)
    val dim = c.where(col("__v").isNotNull)
      .select(size(col("__v"))).take(1) match {
      case Array(r) => r.getInt(0)
      case _ => // empty corpus: empty result, correct schema
        return c.sparkSession.emptyDataFrame
          .select(lit(0L).as("q_id"), lit(0L).as("id"),
            lit(0.0).as("ad"), lit(0).as("rn")).limit(0)
    }
    require(dim % subspaces == 0,
      s"vector length $dim not divisible by $subspaces subspaces")
    val qs = asVec(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__v").as("__qv"))
    val (codes, lut) = pqMachinery(checkDim(c, "__v", dim),
      checkDim(qs, "__qv", dim), subspaces, dim / subspaces, centroids,
      distRound = None, meanRound = None)
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("ad").asc, col("__id").asc)
    codes.crossJoin(broadcast(lut))
      .where(if (excludeSelfIds) col("__id") =!= col("__qid") else lit(true))
      .withColumn("ad", adcExpr(subspaces, distRound = None))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("__qid").as("q_id"), col("__id").as("id"), col("ad"), col("rn"))
  }

  /** Per-row loud length check — a FILTER, not a projected assertion,
    * so the optimizer cannot prune it (assert_true returns null on
    * pass, throws on violation). */
  private def checkDim(df: DataFrame, v: String, dim: Int): DataFrame =
    df.where(expr(
      s"""assert_true(size($v) = $dim, 'vector length mismatch: expected $dim, got '
          || coalesce(cast(size($v) as string), 'null')) is null"""))

  /** ADC distance: LUT-sum over the code array, folded per-row in fixed
    * subspace order (deterministic summation). The oracle-facing gate
    * entries round to 6 decimals so DuckDB agrees bit-for-bit; the
    * facade keeps full precision. */
  private[graft] def adcExpr(subspaces: Int, distRound: Option[Int]): Column = {
    val sum = s"""aggregate(sequence(0, ${subspaces - 1}), 0D,
         (acc, m) -> acc + filter(dt[m], p -> p.cid = codes[m])[0].d)"""
    expr(distRound.map(n => s"round($sum, $n)").getOrElse(sum))
  }

  /** PQ core shared by the facade and the oracle-checked gate entries:
    * trains the codebook (one Lloyd round from the `centroids`
    * lowest-id corpus vectors), encodes the corpus, and builds the
    * per-query LUT. Inputs: corpus (`__id`, `__v`, plus passthrough
    * columns carried onto `codes`) and queries (`__qid`, `__qv`, plus
    * passthrough carried onto the LUT). `distRound`/`meanRound` exist
    * for the gate's oracle determinism (round-6 distances / round-9
    * means so DuckDB replays identically); the facade passes None.
    * Encode/assign are map-only against the packed broadcast codebook
    * (argmin via array_min over (d, cid) structs, ties to lowest cid).
    */
  private[graft] def pqMachinery(c: DataFrame, qs: DataFrame,
      subspaces: Int, subDim: Int, centroids: Int,
      distRound: Option[Int], meanRound: Option[Int]): (DataFrame, DataFrame) = {
    val cExtra = c.columns.filterNot(Set("__id", "__v")).toSeq
    val qExtra = qs.columns.filterNot(Set("__qid", "__qv")).toSeq
    def rDist(e: String) = distRound.map(n => s"round($e, $n)").getOrElse(e)
    def rMean(e: Column) = meanRound.map(n => round(e, n)).getOrElse(e)
    def subs(df: DataFrame, id: String, v: String, extra: Seq[String]) =
      df.select((col(id) +: extra.map(col)) :+ explode(expr(
          s"transform(sequence(0, ${subspaces - 1}), m -> named_struct('m', m, 'sv', slice($v, m * $subDim + 1, $subDim)))")).as("z"): _*)
        .select((col(id) +: extra.map(col)) ++ Seq(col("z.m").as("m"), col("z.sv").as("sv")): _*)
    // consumed by seeds, Lloyd assign, encode — barrier it
    val sub = subs(c, "__id", "__v", cExtra).transform(graft.queries.Q.barrier)
    val seedIds = c.orderBy("__id").limit(centroids).select("__id")
    val seedCb = sub.join(broadcast(seedIds), "__id")
      .select(col("m"), col("__id").as("cid"), col("sv").as("cv"))
    def assign(cb: DataFrame): DataFrame = {
      val packed = cb.groupBy("m").agg(
        expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      sub.join(broadcast(packed), "m")
        .withColumn("best", expr(
          s"""array_min(transform(cs, c -> struct(
               ${rDist("aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")} AS d,
               c.cid AS cid)))"""))
        .select((col("__id") +: cExtra.map(col)) ++
          Seq(col("m"), col("sv"), col("best.cid").as("cid")): _*)
    }
    val cb = assign(seedCb)
      .select(col("m"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("m", "cid", "dim").agg(rMean(avg(col("x"))).as("mu"))
      .groupBy("m", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, mu))), p -> p.mu)").as("cv"))
      .transform(graft.queries.Q.barrier) // consumed by encode + LUT
    // the compressed corpus: `subspaces` small codes per vector, m-ordered
    val codes = assign(cb).groupBy("__id", cExtra: _*)
      .agg(expr("transform(array_sort(collect_list(struct(m, cid))), p -> p.cid)").as("codes"))
    // per-query LUT: dt[m] = codebook distances of subspace m, cid-keyed
    val lut = subs(qs, "__qid", "__qv", qExtra).join(broadcast(cb), "m")
      .select((col("__qid") +: qExtra.map(col)) ++ Seq(col("m"), col("cid"),
        expr(rDist("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")).as("d")): _*)
      .groupBy("__qid", qExtra :+ "m": _*)
      .agg(expr("array_sort(collect_list(struct(cid, d)))").as("dl"))
      .groupBy("__qid", qExtra: _*)
      .agg(expr("transform(array_sort(collect_list(struct(m, dl))), p -> p.dl)").as("dt"))
    (codes, lut)
  }

  /** SQ8 core shared with the oracle-checked `ann_int8_quant` gate
    * entry: per-vector symmetric int8 quantization over (vec_id, v) —
    * adds `s` (scale = max|x| / 127) and `codes` (array<int>, each in
    * [-127, 127]; dequantize as codes[i] * s). `floor(x/s + 0.5)`
    * instead of round() because both engines floor identically while
    * round() half-case conventions differ. A zero vector (s = 0) codes
    * to all zeros rather than dividing by zero. Map-only — no shuffle.
    */
  private[graft] def sq8Quantized(e: DataFrame): DataFrame =
    e.withColumn("s", expr("array_max(transform(v, x -> abs(x))) / 127D"))
      .withColumn("codes", expr(
        "transform(v, x -> cast(if(s = 0D, 0D, floor(x / s + 0.5D)) as int))"))

  /** Symmetric int8 scalar quantization (SQ8): the standard 4x
    * embedding-memory cut (float32 -> int8, typically <0.5% recall
    * cost; PQ compresses further but lossier). Output: the id column,
    * `scale` (double, per-vector = max|x|/127) and `codes`
    * (array<int>, each in [-127, 127]); dequantize as
    * `codes[i] * scale`. Per-row map-only — quantizing a 100 TB corpus
    * is one shuffle-free pass. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val e = asVec(df, idCol, vecCol)
      .select(col("__id").as("vec_id"), col("__v").as("v"))
    sq8Quantized(e)
      .select(col("vec_id").as(idCol), col("s").as("scale"), col("codes"))
  }

  /** Trained-IVF cosine top-k with multi-cell probing — the end-to-end
    * IVF path when rows DON'T already carry a cell key (contrast
    * [[ivfTopK]]): a deterministic 2-round k-means over the corpus
    * builds `cells` centroids, every corpus vector lands in its
    * nearest cell, and each query probes its `nprobe` nearest cells —
    * the standard recall knob; `nprobe = cells` degrades gracefully to
    * exact brute force (spec-pinned). Corpus assignment and probing
    * are map-only against one broadcast centroid row; the probe itself
    * is an equi-join on the cell id, touching ~nprobe/cells of the
    * corpus. Output: (q_id, id, cos, rn). */
  def kmeansIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    cells: Int = 8, nprobe: Int = 1,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    excludeSelfIds: Boolean = true): DataFrame = {
    require(nprobe >= 1 && nprobe <= cells,
      s"kmeansIvfTopK: nprobe ($nprobe) must be in [1, cells=$cells]")
    val c = asVec(corpus, idCol, vecCol)
      .select(col("__id").as("vec_id"), col("__v").as("v"))
    val (assigned, centroids) =
      graft.queries.Similarity.kmeansAssigned(c, cells)
    val qs = asVec(queries, idCol, vecCol)
      .select(col("__id").as("vec_id"), col("__v").as("v"))
    val probed = graft.queries.Similarity.assignTo(qs, centroids, nprobe)
      .select(col("vec_id").as("__qid"), col("cid"), col("v").as("__qv"))
    // corpus vectors sit in ONE cell and probe cells are distinct, so
    // a (query, corpus) pair appears at most once — no dedup needed
    rank(assigned.select(col("vec_id").as("__id"), col("cid"), col("v").as("__v"))
      .join(broadcast(probed), Seq("cid")), k, excludeSelfIds)
  }

  /** LSH-bucketed cosine top-k: random-hyperplane signatures (`bits`
    * sign bits from deterministic md5-parity planes) bucket both sides;
    * each query probes its own bucket plus, at `hamming = 1`, every
    * bucket one bit-flip away, and only bucket-collided candidates get
    * the exact cosine re-rank. The probe is an equi-join on the bucket
    * key (query side exploded into its bits+1 probe keys and broadcast)
    * — the corpus streams through a hash join, never a nested-loop
    * bit_count scan, so the shape stays linear as the query set grows.
    * Recall depends on bits/hamming; measure against [[bruteForceTopK]]
    * on a sample. Vector dimension is taken from the first corpus row.
    * Output: (q_id, id, cos, rn). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 16, hamming: Int = 1,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              excludeSelfIds: Boolean = true): DataFrame = {
    require(bits >= 1 && bits <= 63, s"lshTopK: bits ($bits) must be in [1, 63]")
    require(hamming == 0 || hamming == 1,
      s"lshTopK: hamming radius ($hamming) must be 0 or 1")
    require(k >= 1, s"k must be >= 1, got $k")
    graft.functions.GraftFunctions.registerAll(corpus.sparkSession)
    val c = asVec(corpus, idCol, vecCol)
    val first = c.select(expr("size(__v)").as("d")).limit(1).collect()
    if (first.isEmpty) // empty corpus: schema-stable empty result
      return c.select(col("__id").as("q_id"), col("__id").as("id"),
        lit(null).cast("double").as("cos"), lit(null).cast("int").as("rn")).limit(0)
    val dim = first(0).getInt(0)
    val planesSql = Array.tabulate(bits, dim)(graft.queries.Similarity.planeSign)
      .map(p => s"array(${p.map(x => s"${x}D").mkString(", ")})")
      .mkString("array(", ", ", ")")
    def withBucket(df: DataFrame) = df
      .withColumn("__planes", expr(planesSql))
      .withColumn("__b", expr("graft_lsh_bucket(__planes, __v)"))
      .drop("__planes")
    val cb = withBucket(c)
    val qb = withBucket(asVec(queries, idCol, vecCol))
      .select(col("__id").as("__qid"), col("__v").as("__qv"), col("__b").as("__qb"))
    val probes =
      if (hamming == 0) qb.withColumn("__probe", col("__qb"))
      else qb.withColumn("__probe", explode(expr(
        s"concat(array(__qb), transform(sequence(0, ${bits - 1}), j -> __qb ^ shiftleft(1L, j)))")))
    rank(cb.join(broadcast(probes), col("__b") === col("__probe")), k, excludeSelfIds)
  }

  /** Cosine top-k over int8-quantized vectors — the search half of SQ8:
    * both sides quantize via [[quantizeInt8]]'s core and rank by cosine
    * over the CODE arrays. Cosine is scale-invariant, so code-space
    * ranking equals dequantized ranking exactly, and differs from
    * float32 ranking only by quantization error (typically <0.5%
    * recall; measure against [[bruteForceTopK]] on a sample). The
    * corpus-side scan touches 4x fewer bytes and the arithmetic is
    * integer multiplies. Zero vectors have no cosine direction and are
    * excluded from both sides. Output: (q_id, id, cos, rn). */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               excludeSelfIds: Boolean = true): DataFrame = {
    // codes cast to double for the cosine kernel: int products up to
    // 127*127 are exact in double, so ranking values are unchanged
    def codesOf(df: DataFrame) = sq8Quantized(
      asVec(df, idCol, vecCol).select(col("__id"), col("__v").as("v")))
      .where(col("s") > 0)
      .select(col("__id"), expr("transform(codes, x -> cast(x as double))").as("__v"))
    val qs = codesOf(queries)
      .select(col("__id").as("__qid"), col("__v").as("__qv"))
    rank(codesOf(corpus).crossJoin(broadcast(qs)), k, excludeSelfIds)
  }

  private def rank(scored: DataFrame, k: Int, excludeSelfIds: Boolean): DataFrame = {
    graft.functions.GraftFunctions.registerAll(scored.sparkSession)
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("cos").desc, col("__id").asc)
    scored
      .where(if (excludeSelfIds) col("__id") =!= col("__qid") else lit(true))
      .select(col("__qid"), col("__id"), expr(s"round($Cos, 6)").as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("__qid").as("q_id"), col("__id").as("id"), col("cos"), col("rn"))
  }
}
