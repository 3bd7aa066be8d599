package graft.queries

import graft.pipeline.Multimodal

/** Oracle entry for the multimodal plumbing: the Spark side pushes real
  * bytes through mapPartitions + the stubbed decoder; the oracle
  * recomputes the same features from the md5 hex directly — proving the
  * binary column round-trips bit-exactly through the typed Dataset path.
  */
object MultimodalQ {

  val qs: Map[String, Q] = Map(
    "mm_feature_extract" -> Q(
      (s, dir) =>
        Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
          .toDF().orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(1 + n_chars % 64 AS INTEGER) AS width,
          CAST(1 + n_chars % 48 AS INTEGER) AS height,
          CAST(('0x' || substr(md5(text), 1, 14)) AS BIGINT) AS feat_hash,
          list_sum([CAST(('0x' || substr(md5(text), 2 * i - 1, 2)) AS BIGINT) for i in range(1, 17)]) AS byte_sum
        FROM documents ORDER BY doc_id"""))
  )
}
