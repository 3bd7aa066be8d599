package graft.queries

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions.{broadcast, col, count, countDistinct, expr, lit, max, sum, when}

/** Oracle entry for the multimodal plumbing: the Spark side pushes real
  * bytes through mapPartitions + the stubbed decoder; the oracle
  * recomputes the same features from the md5 hex directly — proving the
  * binary column round-trips bit-exactly through the typed Dataset path.
  */
object MultimodalQ {

  /** The real-PNG media table staged ONCE per driver as parquet (a
    * true binary-column round trip through storage — the layout a
    * media corpus actually has) and shared by both real-image entries:
    * fixture synthesis (per-doc PNG encode) runs in staging, so the
    * measured entries time the DECODE path they exist to exercise. */
  private def realMediaStaged(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    val p = Stage.staged(s"graft-mm-media:$dir") { d =>
      Multimodal.realMediaTable(s, dir).toDF()
        .write.parquet(d.resolve("media.parquet").toString)
    }
    s.read.parquet(p.resolve("media.parquet").toString).as[Multimodal.MediaRow]
  }

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

    // ---- chunk-level PNG metadata, no decode ----
    // Through [[graft.pipeline.Multimodal.pngMeta]]: the geometry
    // prefilter a media pipeline runs BEFORE paying for pixel decode —
    // IHDR fields from a real chunk walk with per-chunk CRC32
    // verification over the actual javax.imageio-encoded bytes. The
    // oracle states the closed-form geometry plus the JDK writer's
    // stable IHDR/IDAT/IEND layout for these tiny truecolor images.
    "mm_png_meta" -> Q(
      (s, dir) =>
        Multimodal.pngMeta(realMediaStaged(s, dir)).toDF().orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(4 + doc_id % 13 AS INTEGER) AS width,
          CAST(4 + doc_id % 11 AS INTEGER) AS height,
          CAST(8 AS INTEGER) AS bit_depth,
          CAST(2 AS INTEGER) AS color_type,
          CAST(3 AS INTEGER) AS n_chunks,
          true AS crc_ok
        FROM documents ORDER BY doc_id""")),

    // ---- perceptual average-hash near-dup pairs ----
    // Through [[graft.pipeline.Multimodal.averageHash]] (see its
    // scaladoc for the 8×8-sample/integer-mean/two-half-packing
    // contract) over REAL decoded PNGs, then Hamming pairing on the
    // packed halves. The doc-keyed gradient makes every sampled pixel
    // closed-form, so the oracle recomputes the hashes and the pair
    // set with pure SQL arithmetic — if the codec, the sampling, or
    // the bit packing drifted, the pair set diverges.
    "mm_ahash_pairs" -> Q(
      (s, dir) => {
        val h = Multimodal.averageHash(
          realMediaStaged(s, dir).filter(col("doc_id") < 60)).toDF()
        h.as("a").join(broadcast(h.as("b")),
            col("b.doc_id") > col("a.doc_id"))
          .selectExpr("a.doc_id AS d1", "b.doc_id AS d2",
            "cast(bit_count(a.ah1 ^ b.ah1) + bit_count(a.ah2 ^ b.ah2) as int) AS ham")
          .where(col("ham") <= 12)
          .orderBy("d1", "d2")
      },
      Some("""WITH g AS (SELECT doc_id AS d,
            CAST(4 + doc_id % 13 AS BIGINT) AS w,
            CAST(4 + doc_id % 11 AS BIGINT) AS h
          FROM documents WHERE doc_id < 60),
        px AS (SELECT d, gi,
            ((gi % 8) * w // 8 + 2 * ((gi // 8) * h // 8) + d) % 256 AS p
          FROM g, range(0, 64) u(gi)),
        m AS (SELECT d, CAST(sum(p) // 64 AS BIGINT) AS mean FROM px GROUP BY d),
        bits AS (SELECT px.d,
            CAST(sum(CASE WHEN gi < 32 AND p > mean
                 THEN 1::BIGINT << CAST(gi AS INTEGER) ELSE 0 END) AS BIGINT) AS ah1,
            CAST(sum(CASE WHEN gi >= 32 AND p > mean
                 THEN 1::BIGINT << CAST(gi - 32 AS INTEGER) ELSE 0 END) AS BIGINT) AS ah2
          FROM px JOIN m ON m.d = px.d GROUP BY px.d)
        SELECT a.d AS d1, b.d AS d2,
          CAST(bit_count(xor(a.ah1, b.ah1)) + bit_count(xor(a.ah2, b.ah2)) AS INTEGER) AS ham
        FROM bits a JOIN bits b ON b.d > a.d
        WHERE bit_count(xor(a.ah1, b.ah1)) + bit_count(xor(a.ah2, b.ah2)) <= 12
        ORDER BY d1, d2""")),

    // ---- dHash near-dup pairs (gradient-sign perceptual hash) ----
    // The brightness-invariant sibling of mm_ahash_pairs: real PNG
    // decode -> 8x9 grid sample -> per-row left-to-right gradient
    // signs packed into two longs -> Hamming pairs over a broadcast
    // self-join of the HASH frame (16 bytes/image — the image bytes
    // never join). The oracle recomputes the sampled pixels
    // closed-form from the generator's (x + 2y + id) % 256 ramp, so
    // decode, sampling geometry, and bit packing are all under the
    // hash.
    "mm_dhash_pairs" -> Q(
      (s, dir) => {
        val h = Multimodal.differenceHash(
          realMediaStaged(s, dir).filter(col("doc_id") < 60)).toDF()
        h.as("a").join(broadcast(h.as("b")),
            col("b.doc_id") > col("a.doc_id"))
          .selectExpr("a.doc_id AS d1", "b.doc_id AS d2",
            "cast(bit_count(a.ah1 ^ b.ah1) + bit_count(a.ah2 ^ b.ah2) as int) AS ham")
          .where(col("ham") <= 12)
          .orderBy("d1", "d2")
      },
      Some("""WITH g AS (SELECT doc_id AS d,
            CAST(4 + doc_id % 13 AS BIGINT) AS w,
            CAST(4 + doc_id % 11 AS BIGINT) AS h
          FROM documents WHERE doc_id < 60),
        px AS (SELECT d, r, c,
            (c * w // 9 + 2 * (r * h // 8) + d) % 256 AS p
          FROM g, range(0, 8) rr(r), range(0, 9) cc(c)),
        bits AS (SELECT l.d,
            CAST(sum(CASE WHEN l.r * 8 + l.c < 32 AND nxt.p > l.p
                 THEN 1::BIGINT << CAST(l.r * 8 + l.c AS INTEGER)
                 ELSE 0 END) AS BIGINT) AS ah1,
            CAST(sum(CASE WHEN l.r * 8 + l.c >= 32 AND nxt.p > l.p
                 THEN 1::BIGINT << CAST(l.r * 8 + l.c - 32 AS INTEGER)
                 ELSE 0 END) AS BIGINT) AS ah2
          FROM px l JOIN px nxt
            ON nxt.d = l.d AND nxt.r = l.r AND nxt.c = l.c + 1
          WHERE l.c < 8
          GROUP BY l.d)
        SELECT a.d AS d1, b.d AS d2,
          CAST(bit_count(xor(a.ah1, b.ah1)) + bit_count(xor(a.ah2, b.ah2)) AS INTEGER) AS ham
        FROM bits a JOIN bits b ON b.d > a.d
        WHERE bit_count(xor(a.ah1, b.ah1)) + bit_count(xor(a.ah2, b.ah2)) <= 12
        ORDER BY d1, d2""")),

    // ---- image near-dup clusters (aHash pairs -> components) ----
    // The multimodal dedup pipeline end to end: real decode -> aHash
    // -> Hamming pairs -> pointer-doubling connected components ->
    // cluster-size histogram. The oracle recomputes the pair set
    // closed-form and labels components with a RECURSIVE transitive
    // closure — a completely different CC formulation that must agree.
    "mm_ahash_clusters" -> Q(
      (s, dir) => {
        val media = realMediaStaged(s, dir).filter(col("doc_id") < 60)
        val h = Multimodal.averageHash(media).toDF()
        val pairs = h.as("a").join(broadcast(h.as("b")),
            col("b.doc_id") > col("a.doc_id"))
          .selectExpr("a.doc_id AS d1", "b.doc_id AS d2",
            "bit_count(a.ah1 ^ b.ah1) + bit_count(a.ah2 ^ b.ah2) AS ham")
          .where(col("ham") <= 0) // exact-hash dedup: ham>0 chains 60 gradients into one giant blob
          .select("d1", "d2")
        val labels = graft.pipeline.CorpusOps.connectedComponents(pairs)
        val all = media.select(col("doc_id").as("node")).toDF()
          .join(labels, Seq("node"), "left")
          .selectExpr("coalesce(label, node) AS label")
        all.groupBy(col("label")).agg(count(lit(1)).as("size"))
          .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
          .orderBy("size")
      },
      Some("""WITH RECURSIVE g AS (SELECT doc_id AS d,
            CAST(4 + doc_id % 13 AS BIGINT) AS w,
            CAST(4 + doc_id % 11 AS BIGINT) AS h
          FROM documents WHERE doc_id < 60),
        px AS (SELECT d, gi,
            ((gi % 8) * w // 8 + 2 * ((gi // 8) * h // 8) + d) % 256 AS p
          FROM g, range(0, 64) u(gi)),
        m AS (SELECT d, CAST(sum(p) // 64 AS BIGINT) AS mean FROM px GROUP BY d),
        bits AS (SELECT px.d,
            CAST(sum(CASE WHEN gi < 32 AND p > mean
                 THEN 1::BIGINT << CAST(gi AS INTEGER) ELSE 0 END) AS BIGINT) AS ah1,
            CAST(sum(CASE WHEN gi >= 32 AND p > mean
                 THEN 1::BIGINT << CAST(gi - 32 AS INTEGER) ELSE 0 END) AS BIGINT) AS ah2
          FROM px JOIN m ON m.d = px.d GROUP BY px.d),
        pr AS (SELECT a.d AS d1, b.d AS d2
          FROM bits a JOIN bits b ON b.d > a.d
          WHERE bit_count(xor(a.ah1, b.ah1)) + bit_count(xor(a.ah2, b.ah2)) <= 0),
        e AS (SELECT d1 AS a, d2 AS b FROM pr
          UNION SELECT d2, d1 FROM pr
          UNION SELECT d, d FROM g),
        reach(a, b) AS (SELECT a, b FROM e
          UNION SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b),
        lab AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a),
        cl AS (SELECT label, count(*) AS size FROM lab GROUP BY label)
        SELECT CAST(size AS BIGINT) AS size, count(*) AS n_clusters
        FROM cl GROUP BY size ORDER BY size""")),

    // ---- REAL codec path: PNG bytes through javax.imageio ----
    // Executor-side: each doc synthesizes a gradient PNG
    // (gray(x,y) = (x + 2y + doc_id) mod 256, w = 4 + id%13,
    // h = 4 + id%11), the bytes ride the binary column, and
    // ImageCodec.decode (a real codec, not the stub) recovers the
    // pixels. PNG is lossless, so the oracle recomputes every decoded
    // feature with closed-form SQL arithmetic — any codec or plumbing
    // corruption diverges the hash. feat_hash packs decoded bytes
    // 0..6 big-endian: the first 7 RGB bytes of row 0 are
    // g0 g0 g0 g1 g1 g1 g2 with gk = (doc_id + k) mod 256.
    // Σ|∇| gradient energy over REAL decoded pixels — the blur /
    // flat-fill screen run before model scoring. The synthetic PNGs'
    // gradient field is closed-form ((x+2y+d) mod 256 per channel:
    // horizontal steps are 1 except the 255→0 wrap, vertical 2 except
    // ≥254 wraps), so the oracle replays the arithmetic while the
    // Spark side walks the actual decoded buffer — codec corruption
    // diverges the hash.
    "mm_gradient_energy" -> Q(
      (s, dir) =>
        Multimodal.gradientEnergy(realMediaStaged(s, dir))
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(4 + doc_id % 13 AS INTEGER) AS w,
            CAST(4 + doc_id % 11 AS INTEGER) AS h
          FROM documents),
        hh AS (SELECT g.doc_id,
            3 * sum(CASE WHEN (x.i + 2 * y.i + g.doc_id) % 256 = 255
                         THEN 255 ELSE 1 END) AS he
          FROM g, range(0, 17) x(i), range(0, 15) y(i)
          WHERE x.i < g.w - 1 AND y.i < g.h GROUP BY g.doc_id),
        vv AS (SELECT g.doc_id,
            3 * sum(CASE WHEN (x.i + 2 * y.i + g.doc_id) % 256 >= 254
                         THEN 254 ELSE 2 END) AS ve
          FROM g, range(0, 17) x(i), range(0, 15) y(i)
          WHERE x.i < g.w AND y.i < g.h - 1 GROUP BY g.doc_id)
        SELECT g.doc_id, g.w AS width, g.h AS height,
          CAST(hh.he + vv.ve AS BIGINT) AS grad_energy
        FROM g JOIN hh ON g.doc_id = hh.doc_id
          JOIN vv ON g.doc_id = vv.doc_id
        ORDER BY g.doc_id""")),

    "mm_real_decode" -> Q(
      (s, dir) =>
        Multimodal.extractFeatures(realMediaStaged(s, dir),
            useRealCodec = true)
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(4 + doc_id % 13 AS INTEGER) AS w,
            CAST(4 + doc_id % 11 AS INTEGER) AS h
          FROM documents)
        SELECT g.doc_id, g.w AS width, g.h AS height,
          CAST((g.doc_id % 256) * 282578783305728
            + ((g.doc_id + 1) % 256) * 16843008
            + ((g.doc_id + 2) % 256) AS BIGINT) AS feat_hash,
          CAST(3 * sum((x.i + 2 * y.i + g.doc_id) % 256) AS BIGINT) AS byte_sum
        FROM g, range(0, 17) x(i), range(0, 15) y(i)
        WHERE x.i < g.w AND y.i < g.h
        GROUP BY g.doc_id, g.w, g.h
        ORDER BY doc_id""")),

    // nearest-neighbor 2x2 resize over REAL decoded PNG pixels: the
    // same flat-buffer kernel as mm_resize, replayed by the oracle on
    // the closed-form gradient (src // 3 recovers the pixel index,
    // % w / // w its x and y)
    "mm_real_resize" -> Q(
      (s, dir) =>
        Multimodal.resize(realMediaStaged(s, dir),
            outW = 2, outH = 2, useRealCodec = true)
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(4 + doc_id % 13 AS INTEGER) AS w,
            CAST(4 + doc_id % 11 AS INTEGER) AS h
          FROM documents),
        sz AS (SELECT doc_id, w, h, 3 * w * h AS nb FROM g),
        src AS (SELECT doc_id, w,
            ((y.i * nb) // 2 + (x.i * nb) // 4) % nb AS si
          FROM sz, range(0, 2) x(i), range(0, 2) y(i))
        SELECT doc_id, 2 AS out_w, 2 AS out_h,
          CAST(sum(((si // 3) % w + 2 * ((si // 3) // w) + doc_id) % 256) AS BIGINT) AS pixel_sum
        FROM src GROUP BY doc_id ORDER BY doc_id""")),

    // REAL multi-frame path: per-doc animated GIF (indexed 256-gray
    // palette -> lossless), every-4th-frame sampling through the JDK's
    // multi-frame ImageReader; the oracle replays frame count, the
    // sampled frames' first-pixel values ((3f + d) mod 256) and their
    // full gray-plane sums from the gradient formula
    "mm_real_frames" -> Q(
      (s, dir) =>
        Multimodal.sampleRealFrames(Multimodal.realVideoTable(s, dir), every = 4)
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(5 + doc_id % 12 AS INTEGER) AS nf
          FROM documents),
        k AS (SELECT doc_id, nf, CAST((nf + 3) // 4 AS INTEGER) AS ns FROM g),
        fr AS (SELECT doc_id, nf, ns, f.i * 4 AS f
          FROM k, range(0, 4) f(i) WHERE f.i < ns),
        fb AS (SELECT doc_id,
            CAST(sum((3 * f + doc_id) % 256) AS BIGINT) AS first_byte_sum
          FROM fr GROUP BY doc_id),
        ps AS (SELECT doc_id,
            CAST(sum((x.i + 2 * y.i + 3 * fr.f + fr.doc_id) % 256) AS BIGINT) AS pix_sum
          FROM fr, range(0, 8) x(i), range(0, 6) y(i) GROUP BY doc_id)
        SELECT k.doc_id, k.nf AS n_frames, k.ns AS n_sampled,
          fb.first_byte_sum, ps.pix_sum
        FROM k JOIN fb USING (doc_id) JOIN ps USING (doc_id)
        ORDER BY doc_id""")),

    // REAL audio path: per-doc WAV (PCM16 mono, closed-form signal)
    // through javax.sound.sampled; the oracle recomputes duration,
    // sum and peak from the signal formula. abs(-32768) stays in Int.
    "mm_real_audio" -> Q(
      (s, dir) =>
        Multimodal.extractAudioFeatures(Multimodal.realAudioTable(s, dir))
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(64 + doc_id % 97 AS INTEGER) AS n
          FROM documents)
        SELECT g.doc_id, 8000 AS sample_rate, g.n AS n_samples,
          CAST(sum((i.i * 31 + g.doc_id * 7) % 65536 - 32768) AS BIGINT) AS sample_sum,
          CAST(max(abs((i.i * 31 + g.doc_id * 7) % 65536 - 32768)) AS INTEGER) AS peak
        FROM g, range(0, 161) i(i)
        WHERE i.i < g.n
        GROUP BY g.doc_id, g.n
        ORDER BY doc_id""")),

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
        FROM documents ORDER BY doc_id""")),

    // Frame-level loudness through the REAL WAV decode: 32-sample
    // energy windows per clip (the VAD/silence-trim input), rolled up
    // per window index across the corpus. The oracle replays the
    // closed-form signal, never touching the codec — so the WAV
    // round trip and the window walk check each other.
    "mm_audio_energy" -> Q(
      (s, dir) =>
        Multimodal.audioEnergyWindows(Multimodal.realAudioTable(s, dir))
          .toDF()
          .groupBy("win")
          .agg(count(lit(1)).as("n_windows"),
            sum(col("n_in_win")).cast("long").as("n_samples"),
            sum(col("abs_sum")).as("abs_mass"),
            max(col("peak")).as("max_peak"))
          .orderBy("win"),
      Some("""WITH g AS (SELECT doc_id, CAST(64 + doc_id % 97 AS INTEGER) AS n
          FROM documents),
        w AS (SELECT g.doc_id, CAST(i.i // 32 AS INTEGER) AS win,
            abs((i.i * 31 + g.doc_id * 7) % 65536 - 32768) AS a
          FROM g, range(0, 161) i(i) WHERE i.i < g.n)
        SELECT win, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_windows,
          count(*) AS n_samples,
          CAST(sum(a) AS BIGINT) AS abs_mass,
          CAST(max(a) AS INTEGER) AS max_peak
        FROM w GROUP BY win ORDER BY win""")),

    // ---- silence-run census through the real WAV decode ----
    // The voice-activity-detection primitive: a 32-sample window is
    // "quiet" when its mean |amplitude| is under the threshold
    // (tuned so the synthetic ramp corpus populates every tier), and
    // consecutive quiet windows chain into silence runs (the spans a
    // speech pipeline trims or splits on). Decode and windowed energy
    // reuse the mm_audio_energy path (bytes stay on executors); the
    // run chaining is gaps-islands partitioned PER CLIP — win minus
    // the quiet-rank is constant within a run — so the windows of a
    // 100 TB audio corpus chain in parallel per key with no global
    // sort. The oracle replays the ramp-generator samples closed-form.
    "mm_audio_silence" -> Q(
      (s, dir) => {
        val w = Multimodal.audioEnergyWindows(
          Multimodal.realAudioTable(s, dir)).toDF()
        val quiet = w.where(expr("abs_sum div n_in_win < 30000"))
        val runs = quiet
          .withColumn("grp", expr(
            "win - row_number() OVER (PARTITION BY doc_id ORDER BY win)"))
          .groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("run_len"))
        runs.groupBy("run_len")
          .agg(count(lit(1)).as("n_runs"),
            countDistinct(col("doc_id")).as("n_clips"))
          .orderBy("run_len")
      },
      Some("""WITH g AS (SELECT doc_id, CAST(64 + doc_id % 97 AS INTEGER) AS n
          FROM documents),
        w AS (SELECT g.doc_id, CAST(i.i // 32 AS INTEGER) AS win,
            count(*) AS n_in_win,
            CAST(sum(abs((i.i * 31 + g.doc_id * 7) % 65536 - 32768))
              AS BIGINT) AS abs_sum
          FROM g, range(0, 161) i(i) WHERE i.i < g.n
          GROUP BY g.doc_id, win),
        quiet AS (SELECT doc_id, win,
            win - row_number() OVER (PARTITION BY doc_id ORDER BY win) AS grp
          FROM w WHERE abs_sum // n_in_win < 30000),
        runs AS (SELECT doc_id, grp, count(*) AS run_len
          FROM quiet GROUP BY doc_id, grp)
        SELECT CAST(run_len AS BIGINT) AS run_len, count(*) AS n_runs,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_clips
        FROM runs GROUP BY run_len ORDER BY run_len""")),

    // ---- loudness-bin census through the real WAV decode ----
    // The loudness-normalization screen: per-clip mean |amplitude|
    // (integer floor of abs mass / samples, via
    // Multimodal.audioLoudness's executor-side decode pass), bucketed
    // into 2048-unit bins and folded into a corpus census — one row
    // per occupied bin with clip count and id checksum. A speech
    // pipeline drops or rescales the extreme bins before training.
    // Output is bounded by the 16-bit amplitude range (<= 16 bins),
    // not corpus size; the oracle replays the ramp-generator samples
    // closed-form. Integer-exact on both engines at every tier (the
    // per-clip phase 7*doc_id spreads clips across bins even before
    // the mod-65536 wrap kicks in at larger doc ids).
    "mm_audio_loudness_bins" -> Q(
      (s, dir) => {
        Multimodal.audioLoudness(Multimodal.realAudioTable(s, dir))
          .toDF()
          .groupBy(expr("(abs_sum div n_samples) div 2048").as("bin"))
          .agg(count(lit(1)).as("n_clips"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("bin")
      },
      Some("""WITH g AS (SELECT doc_id, CAST(64 + doc_id % 97 AS INTEGER) AS n
          FROM documents),
        s AS (SELECT g.doc_id, g.n,
            abs((i.i * 31 + g.doc_id * 7) % 65536 - 32768) AS a
          FROM g, range(0, 161) i(i) WHERE i.i < g.n),
        z AS (SELECT doc_id, (sum(a) // max(n)) // 2048 AS bin
          FROM s GROUP BY doc_id)
        SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_clips,
          CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM z GROUP BY bin ORDER BY bin""")),

    // ---- exposure-bin census through the real PNG decode ----
    // The over/under-exposure screen an image-curation pipeline runs
    // before training: per-image mean pixel value (byte_sum over the
    // decoded RGB buffer div 3*w*h — the channels are equal in the
    // gradient fixture, and floor((3s)/(3n)) == floor(s/n) so the
    // 3-channel sum needs no correction), bucketed into 16-value bins.
    // Reuses extractFeatures' executor-side decode (bytes never reach
    // the driver); the census is one keyed agg over the per-image
    // frame, output bounded by the 8-bit range (<= 16 bins). The
    // oracle replays the (x + 2y + d) % 256 generator closed-form.
    "mm_image_exposure_bins" -> Q(
      (s, dir) =>
        Multimodal.extractFeatures(realMediaStaged(s, dir),
            useRealCodec = true)
          .toDF()
          .groupBy(expr("(byte_sum div (3 * width * height)) div 16").as("bin"))
          .agg(count(lit(1)).as("n_images"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("bin"),
      Some("""WITH g AS (SELECT doc_id,
            CAST(4 + doc_id % 13 AS INTEGER) AS w,
            CAST(4 + doc_id % 11 AS INTEGER) AS h
          FROM documents),
        px AS (SELECT g.doc_id, g.w, g.h,
            sum((x.i + 2 * y.i + g.doc_id) % 256) AS s
          FROM g, range(0, 17) x(i), range(0, 15) y(i)
          WHERE x.i < g.w AND y.i < g.h GROUP BY g.doc_id, g.w, g.h),
        e AS (SELECT doc_id, (s // (w * h)) // 16 AS bin FROM px)
        SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_images,
          CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM e GROUP BY bin ORDER BY bin""")),

    // ---- inter-frame difference energy (scene-change screen) ----
    // Per-clip Σ|frame_{f+1} - frame_f| through the REAL animated-GIF
    // decode (Multimodal.frameDiffEnergy) — static-slideshow clips
    // score near zero, hard cuts spike; a video pipeline drops or
    // re-samples both tails. The oracle replays the gradient
    // generator closed-form: consecutive frames differ by +3 mod 256
    // per pixel, so each pixel contributes 3 unless it wraps
    // (value >= 253 contributes 253), times 3 channels.
    "mm_frame_diff_energy" -> Q(
      (s, dir) =>
        Multimodal.frameDiffEnergy(Multimodal.realVideoTable(s, dir))
          .toDF().orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, CAST(5 + doc_id % 12 AS INTEGER) AS nf
          FROM documents),
        px AS (SELECT g.doc_id, g.nf,
            3 * sum(CASE WHEN (x.i + 2 * y.i + 3 * f.i + g.doc_id) % 256 >= 253
                         THEN 253 ELSE 3 END) AS de
          FROM g, range(0, 16) f(i), range(0, 8) x(i), range(0, 6) y(i)
          WHERE f.i < g.nf - 1 GROUP BY g.doc_id, g.nf)
        SELECT doc_id, nf AS n_frames, CAST(de AS BIGINT) AS diff_energy
        FROM px ORDER BY doc_id"""))
  )
}
