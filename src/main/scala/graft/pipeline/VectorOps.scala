package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, DataFrame-in / DataFrame-out similarity search over an
  * embedding column (`array<float>` or `array<double>`) — the API a
  * user calls on their OWN vector tables; the gate entries in
  * [[graft.queries.Similarity]] exercise the same plan shapes against
  * the oracle.
  *
  * Scale contract (see SCALE.md): the corpus side never shuffles — the
  * query set broadcasts (brute force), or the probe is an equi-join on
  * a cell key (IVF) — and the only wide operation is the per-query
  * top-k window.
  */
object VectorOps {

  private def asVec(df: DataFrame, idCol: String, vecCol: String,
                    extra: Seq[(String, String)] = Nil): DataFrame =
    df.select(col(idCol).cast("long").as("__id") +:
      expr(s"transform($vecCol, x -> cast(x as double))").as("__v") +:
      extra.map { case (c, a) => col(c).as(a) }: _*)

  private val Cos =
    """aggregate(zip_with(__qv, __v, (p, x) -> p * x), 0D, (a, x) -> a + x)
       / (sqrt(aggregate(transform(__qv, x -> x * x), 0D, (a, x) -> a + x))
          * sqrt(aggregate(transform(__v, x -> x * x), 0D, (a, x) -> a + x)))"""

  /** Exact cosine top-k: for every query row, the `k` most similar
    * corpus rows (self-matches by id excluded). Output: (query id
    * `q_id`, corpus id `id`, `cos`, rank `rn`). The query set is
    * broadcast — size it accordingly (thousands, not millions); the
    * corpus streams through map-side scoring into a per-query top-k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = asVec(corpus, idCol, vecCol)
    val q = asVec(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__v").as("__qv"))
    rank(c.crossJoin(broadcast(q)), k)
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
              vecCol: String = "embedding"): DataFrame = {
    val c = asVec(corpus, idCol, vecCol, Seq(cellCol -> "__cell"))
    val q = asVec(queries, idCol, vecCol, Seq(cellCol -> "__qcell"))
      .select(col("__id").as("__qid"), col("__v").as("__qv"), col("__qcell"))
    rank(c.join(broadcast(q), col("__cell") === col("__qcell")), k)
  }

  /** Product-quantization top-k (the `ann_pq_adc` gate shape on user
    * tables): each corpus vector compresses to `subspaces` codebook
    * codes — `dim * 4` bytes become `subspaces` bytes — and queries
    * rank by asymmetric distance (their per-subspace distance LUT,
    * broadcast, folded over the code array per row). The codebook is
    * `centroids` centroids per subspace, trained with one Lloyd round
    * from the `centroids` lowest-id corpus vectors. Approximate by
    * design: ranks reflect quantized distances (`ad`, squared L2), not
    * exact ones — measure recall against [[bruteForceTopK]] on a
    * sample. Requires the vector length to be divisible by
    * `subspaces`; corpus and queries must share that length.
    *
    * Scale contract: encode and scan are map-only against broadcast
    * codebook/LUT — the corpus never shuffles; only the bounded
    * codebook aggregations and the per-query top-k window are wide.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             subspaces: Int = 8, centroids: Int = 4,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val c = asVec(corpus, idCol, vecCol)
    val dim = c.select(size(col("__v"))).head().getInt(0)
    require(dim % subspaces == 0, s"vector length $dim not divisible by $subspaces subspaces")
    val sd = dim / subspaces
    def subs(df: DataFrame): DataFrame = df.select(col("__id"), explode(expr(
        s"transform(sequence(0, ${subspaces - 1}), m -> named_struct('m', m, 'sv', slice(__v, m * $sd + 1, $sd)))")).as("z"))
      .select(col("__id"), col("z.m").as("m"), col("z.sv").as("sv"))
    val sub = subs(c).transform(graft.queries.Q.barrier)
    val seedIds = c.orderBy("__id").limit(centroids).select("__id")
    val seedCb = sub.join(broadcast(seedIds), "__id")
      .select(col("m"), col("__id").as("cid"), col("sv").as("cv"))
    def assign(cb: DataFrame, sv: DataFrame): DataFrame = {
      val packed = cb.groupBy("m").agg(
        expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      sv.join(broadcast(packed), "m")
        .withColumn("best", expr(
          """array_min(transform(cs, c -> struct(
               aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x) AS d,
               c.cid AS cid)))"""))
        .select(col("__id"), col("m"), col("sv"), col("best.cid").as("cid"))
    }
    val cb = assign(seedCb, sub)
      .select(col("m"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("m", "cid", "dim").agg(avg(col("x")).as("mu"))
      .groupBy("m", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, mu))), p -> p.mu)").as("cv"))
      .transform(graft.queries.Q.barrier)
    val codes = assign(cb, sub).groupBy("__id")
      .agg(expr("transform(array_sort(collect_list(struct(m, cid))), p -> p.cid)").as("codes"))
    val q = asVec(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__v").as("__qv"))
    val lut = subs(q.select(col("__qid").as("__id"), col("__qv").as("__v")))
      .join(broadcast(cb), "m")
      .select(col("__id").as("__qid"), col("m"), col("cid"),
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)").as("d"))
      .groupBy("__qid", "m")
      .agg(expr("array_sort(collect_list(struct(cid, d)))").as("dl"))
      .groupBy("__qid")
      .agg(expr("transform(array_sort(collect_list(struct(m, dl))), p -> p.dl)").as("dt"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("ad").asc, col("__id").asc)
    codes.crossJoin(broadcast(lut))
      .where(col("__id") =!= col("__qid"))
      .withColumn("ad", expr(
        s"""aggregate(sequence(0, ${subspaces - 1}), 0D,
             (acc, m) -> acc + filter(dt[m], p -> p.cid = codes[m])[0].d)"""))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("__qid").as("q_id"), col("__id").as("id"), col("ad"), col("rn"))
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("cos").desc, col("__id").asc)
    scored
      .where(col("__id") =!= col("__qid"))
      .select(col("__qid"), col("__id"), expr(s"round($Cos, 6)").as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("__qid").as("q_id"), col("__id").as("id"), col("cos"), col("rn"))
  }
}
