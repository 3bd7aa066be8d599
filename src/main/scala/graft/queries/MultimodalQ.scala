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
          CAST(list_sum([CAST(('0x' || substr(md5(text), 2 * i - 1, 2)) AS BIGINT) for i in range(1, 17)]) AS BIGINT) AS byte_sum
        FROM documents ORDER BY doc_id""")),

    // frame sampling: every 4th frame of a (4 + doc_id%12 + 1)-frame
    // "video"; the oracle recomputes frame-0 bytes from md5 hex
    "mm_frame_sample" -> Q(
      (s, dir) =>
        Multimodal.sampleFrames(Multimodal.videoTable(s, dir), every = 4)
          .toDF().orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(5 + doc_id % 12 AS INTEGER) AS n_frames,
          CAST((5 + doc_id % 12 + 3) // 4 AS INTEGER) AS n_sampled,
          CAST(list_sum([CAST(('0x' || substr(md5(text || CAST(i * 4 AS VARCHAR)), 1, 2)) AS BIGINT)
                    for i in range(0, CAST((5 + doc_id % 12 + 3) // 4 AS BIGINT))]) AS BIGINT) AS first_byte_sum
        FROM documents ORDER BY doc_id""")),

    // CLIP-style pair filtering: image emb vs caption emb cosine >= 0.9,
    // decided in integers (cross-multiplied, no float division) so the
    // keep bit is engine-exact; the oracle replays both stub encoders
    // from md5 hex
    "mm_pair_filter" -> Q(
      (s, dir) =>
        Multimodal.filterPairs(Multimodal.pairTable(s, dir), minCos100 = 90)
          .toDF().orderBy("doc_id"),
      Some("""WITH v AS (SELECT doc_id,
            [CAST(('0x' || substr(md5(text), 2*i-1, 2)) AS BIGINT) for i in range(1, 17)] AS a,
            [CAST(('0x' || substr(md5(reverse(text)), 2*i-1, 2)) AS BIGINT) for i in range(1, 17)] AS b
          FROM documents),
        sc AS (SELECT doc_id,
            CAST(list_sum([a[i]*b[i] for i in range(1, 17)]) AS BIGINT) AS dot,
            CAST(list_sum([a[i]*a[i] for i in range(1, 17)]) AS BIGINT) AS na,
            CAST(list_sum([b[i]*b[i] for i in range(1, 17)]) AS BIGINT) AS nb
          FROM v)
        SELECT doc_id, dot, na, nb,
          dot >= 0 AND dot*dot*10000 >= 8100*na*nb AS keep
        FROM sc ORDER BY doc_id""")),

    // nearest-neighbor resize of the 16-byte stub buffer to 2x2: the
    // oracle replays the same index arithmetic over the md5 hex bytes
    "mm_resize" -> Q(
      (s, dir) =>
        Multimodal.resize(Multimodal.mediaTable(s, dir), outW = 2, outH = 2)
          .toDF().orderBy("doc_id"),
      Some("""SELECT doc_id, 2 AS out_w, 2 AS out_h,
          -- nearest-neighbor sources for 2x2 over 16 bytes: (8y+4x)%16
          -- = indices 0, 4, 8, 12 -> hex offsets 1, 9, 17, 25
          CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)
          + CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)
          + CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)
          + CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT) AS pixel_sum
        FROM documents ORDER BY doc_id"""))
  )
}
