package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SeqOps}

/** Oracle-checked coverage of the scalar surface (SURVEY.md §2.C).
  *
  * DuckDB has none of these functions, so each oracle re-expresses the
  * semantics in ANSI SQL over DNA/CIGAR/quality strings synthesized
  * deterministically from the lineitem table (digits -> nucleotides via
  * translate). The Spark side evaluates the real Catalyst expressions;
  * a value mismatch in any row fails the hash compare.
  */
object ScalarFns {
  import Q.t

  /** Deterministic per-row DNA over ~1/37th of lineitem. */
  // (key+1)*1000003 keeps every sequence >= 7 nucleotides (key 0 exists).
  private val SeqSql =
    "translate(CAST((l_orderkey + 1) * 1000003 + l_linenumber AS VARCHAR), '0123456789', 'ACGTACGTAC')"
  private val BaseWhere = "l_linenumber = 1 AND l_orderkey % 37 = 0"
  private val BaseCte =
    s"WITH d AS (SELECT l_orderkey AS key, $SeqSql AS seq FROM lineitem WHERE $BaseWhere)"

  private def dna(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    t(s, dir, "lineitem")
      .where(expr(BaseWhere))
      .select(col("l_orderkey").as("key"),
        expr(SeqSql.replace("VARCHAR", "STRING")).as("seq"))
  }

  /** CASE mapping a 3-char codon column to its amino acid (oracle side). */
  private def codonCaseSql(codonExpr: String): String =
    SeqOps.codonPairs
      .map { case (c, aa) => s"WHEN '$c' THEN '$aa'" }
      .mkString(s"CASE $codonExpr ", " ", " END")

  val qs: Map[String, Q] = Map(

    // complement / transcribe / reverse_transcribe / reverse_complement / gc_content
    "fn_sequence_ops" -> Q(
      (s, dir) =>
        dna(s, dir).selectExpr(
          "key", "seq",
          "complement(seq) AS comp",
          "transcribe(seq) AS rna",
          "reverse_transcribe(transcribe(seq)) AS back",
          "reverse_complement(seq) AS revcomp",
          "gc_content(seq) AS gc")
          .orderBy("key"),
      Some(s"""$BaseCte SELECT key, seq,
        translate(seq, 'ACGT', 'TGCA') AS comp,
        replace(seq, 'T', 'U') AS rna,
        seq AS back,
        translate(seq, 'ATCG', 'CGAT') AS revcomp,
        CAST(CAST(length(seq) - length(replace(replace(seq, 'G', ''), 'C', '')) AS DOUBLE) / length(seq) AS REAL) AS gc
        FROM d ORDER BY key""")),

    // translate_dna_to_aa over the whole (codon-truncated) sequence
    "fn_translate_aa" -> Q(
      (s, dir) =>
        dna(s, dir).selectExpr(
          "key",
          "translate_dna_to_aa(substring(seq, 1, (length(seq) div 3) * 3)) AS aa")
          .orderBy("key"),
      Some(s"""$BaseCte SELECT key,
        list_aggregate([${codonCaseSql("substr(seq, i * 3 + 1, 3)")}
                        for i in range(0, length(seq) // 3)],
                       'string_agg', '') AS aa
        FROM d ORDER BY key""")),

    // the 12 SAM FLAG bit predicates
    "fn_sam_flags" -> Q(
      (s, dir) => {
        GraftFunctions.registerAll(s)
        val flags = t(s, dir, "lineitem")
          .where(expr(BaseWhere))
          .select(col("l_orderkey").as("key"),
            (col("l_orderkey") % 4096).cast("int").as("flag"))
        flags.selectExpr(
          Seq("key", "flag") ++
            GraftFunctions.samFlagBits.map { case (n, _) => s"$n(flag) AS $n" }: _*)
          .orderBy("key")
      },
      Some {
        val preds = GraftFunctions.samFlagBits
          .map { case (n, bit) => s"((flag & $bit) <> 0) AS $n" }
          .mkString(", ")
        s"""WITH d AS (SELECT l_orderkey AS key, CAST(l_orderkey % 4096 AS INTEGER) AS flag
            FROM lineitem WHERE $BaseWhere)
            SELECT key, flag, $preds FROM d ORDER BY key"""
      }),

    // parse_cigar, exploded to (key, pos, op, len) rows
    "fn_parse_cigar" -> Q(
      (s, dir) => {
        GraftFunctions.registerAll(s)
        t(s, dir, "lineitem")
          .where(expr(BaseWhere))
          .select(col("l_orderkey").as("key"),
            expr("concat(CAST(l_quantity AS INT), 'M', CAST(l_partkey % 90 + 1 AS INT), 'S')").as("cigar"))
          .select(col("key"), posexplode(expr("parse_cigar(cigar)")))
          .selectExpr("key", "pos", "col.op AS op", "col.len AS len")
          .orderBy("key", "pos")
      },
      Some(s"""WITH d AS (SELECT l_orderkey AS key, CAST(l_quantity AS INTEGER) AS qty,
          CAST(l_partkey % 90 + 1 AS INTEGER) AS sc
          FROM lineitem WHERE $BaseWhere)
        SELECT key, 0 AS pos, 'M' AS op, qty AS len FROM d
        UNION ALL SELECT key, 1, 'S', sc FROM d
        ORDER BY key, pos""")),

    // extract_from_cigar: leading/trailing insertion trim
    "fn_extract_cigar" -> Q(
      (s, dir) =>
        dna(s, dir)
          .withColumn("ex", expr("extract_from_cigar(seq, concat('2I', length(seq) - 4, 'M2I'))"))
          .selectExpr("key",
            "ex.sequence_start AS seq_start",
            "ex.sequence_end AS seq_end",
            "ex.sequence AS seq_mid")
          .orderBy("key"),
      Some(s"""$BaseCte SELECT key,
        2 AS seq_start,
        CAST(length(seq) - 2 AS INTEGER) AS seq_end,
        substr(seq, 3, length(seq) - 4) AS seq_mid
        FROM d ORDER BY key""")),

    // Phred+33 decode, exploded to (key, pos, score)
    "fn_quality_decode" -> Q(
      (s, dir) => {
        GraftFunctions.registerAll(s)
        t(s, dir, "lineitem")
          .where(expr(BaseWhere))
          .selectExpr("l_orderkey AS key",
            "concat(char(33 + l_orderkey % 60), char(33 + (l_orderkey * 7) % 60), char(33 + (l_orderkey * 13) % 60)) AS q")
          .select(col("key"), posexplode(expr("quality_score_string_to_list(q)")))
          .selectExpr("key", "pos", "col AS score")
          .orderBy("key", "pos")
      },
      Some(s"""WITH d AS (SELECT l_orderkey AS key FROM lineitem WHERE $BaseWhere)
        SELECT key, 0 AS pos, CAST(key % 60 AS INTEGER) AS score FROM d
        UNION ALL SELECT key, 1, CAST((key * 7) % 60 AS INTEGER) FROM d
        UNION ALL SELECT key, 2, CAST((key * 13) % 60 AS INTEGER) FROM d
        ORDER BY key, pos""")),

    // gff_parse_attributes, probed via element_at
    "fn_gff_attributes" -> Q(
      (s, dir) =>
        dna(s, dir)
          .withColumn("m", expr("gff_parse_attributes(concat('gene_id=g', key, '; score=', key % 100, ';'))"))
          .selectExpr("key", "element_at(m, 'gene_id') AS gene_id", "element_at(m, 'score') AS score_s")
          .orderBy("key"),
      Some(s"""$BaseCte SELECT key,
        'g' || CAST(key AS VARCHAR) AS gene_id,
        CAST(key % 100 AS VARCHAR) AS score_s
        FROM d ORDER BY key""")),

    // gap-affine alignment: self-alignment and a 2-char text extension
    // have closed-form CIGARs/scores (nM / nM2D, 0 / -(open+2*ext))
    "fn_alignment" -> Q(
      (s, dir) =>
        dna(s, dir).selectExpr(
          "key",
          "alignment_string(seq, seq) AS cig_self",
          "cast(alignment_score(seq, seq) as double) AS score_self",
          "alignment_string_wfa_gap_affine(seq, concat(seq, 'AC')) AS cig_ext",
          "cast(alignment_score_wfa_gap_affine(seq, concat(seq, 'AC')) as double) AS score_ext")
          .orderBy("key"),
      Some(s"""$BaseCte SELECT key,
        CAST(length(seq) AS VARCHAR) || 'M' AS cig_self,
        CAST(0 AS DOUBLE) AS score_self,
        CAST(length(seq) AS VARCHAR) || 'M2D' AS cig_ext,
        CAST(-10 AS DOUBLE) AS score_ext
        FROM d ORDER BY key""")),

    // version literal
    "fn_version" -> Q(
      (s, dir) => {
        GraftFunctions.registerAll(s)
        s.range(1).selectExpr("exondb_version() AS v")
      },
      Some(s"SELECT '${GraftFunctions.ExonDbVersion}' AS v")),

    // norm_variant: parsimony trimming (the reference-free half of
    // bcftools norm). Four generated classes — padded SNP, padded
    // deletion, padded insertion, symbolic pass-through — with the
    // trim amounts known by construction, so the oracle states the
    // normalized triple closed-form instead of re-running a trim loop.
    "fn_norm_variant" -> Q(
      (s, dir) => {
        GraftFunctions.registerAll(s)
        s.range(400).selectExpr(
            "id AS i",
            "1000 + id AS pos",
            "concat(repeat('A', cast(id % 3 as int)), " +
              "CASE cast(id % 4 as int) WHEN 0 THEN 'C' WHEN 1 THEN 'CAG' WHEN 2 THEN 'T' ELSE 'C' END, " +
              "repeat('T', cast(id % 2 as int))) AS ref",
            "CASE cast(id % 4 as int) WHEN 3 THEN '<DEL>' ELSE " +
              "concat(repeat('A', cast(id % 3 as int)), " +
              "CASE cast(id % 4 as int) WHEN 0 THEN 'G' WHEN 1 THEN 'C' ELSE 'TGG' END, " +
              "repeat('T', cast(id % 2 as int))) END AS alt")
          .selectExpr("i", "norm_variant(pos, ref, alt) AS nv")
          .selectExpr("i", "nv.pos AS pos2", "nv.ref AS ref2", "nv.alt AS alt2")
          .orderBy("i")
      },
      Some("""SELECT i,
          CASE WHEN i % 4 = 3 THEN 1000 + i ELSE 1000 + i + (i % 3) END AS pos2,
          CASE CAST(i % 4 AS INTEGER) WHEN 0 THEN 'C' WHEN 1 THEN 'CAG' WHEN 2 THEN 'T'
            ELSE repeat('A', CAST(i % 3 AS INTEGER)) || 'C' || repeat('T', CAST(i % 2 AS INTEGER)) END AS ref2,
          CASE CAST(i % 4 AS INTEGER) WHEN 0 THEN 'G' WHEN 1 THEN 'C' WHEN 2 THEN 'TGG'
            ELSE '<DEL>' END AS alt2
        FROM range(0, 400) t(i) ORDER BY i"""))
  )
}
