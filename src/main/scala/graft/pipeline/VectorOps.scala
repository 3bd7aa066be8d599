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
