package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl-corpus curation (the step between a
  * WARC scan and every text-pipeline operator: quality scoring,
  * language ID, dedup all expect plain text).
  *
  * Built entirely from Spark's codegen'd regexp/string functions — no
  * UDF, so the whole extraction inlines into WholeStageCodegen next to
  * the downstream filters. This is deliberately the heuristic tier of
  * extraction (tag stripping, not DOM-aware readability): deterministic,
  * dependency-free, and what a first-pass 100 TB crawl filter wants;
  * boilerplate removal beyond this is a model/library concern that
  * belongs behind the multimodal codec seam, not in the scan plan.
  *
  * Beyond the reference (exon-duckdb is bio-only); standard pipeline
  * practice (C4/CCNet-style pre-cleaning).
  */
object HtmlOps {

  /** Strip markup from an HTML string column:
    * script/style/comment blocks drop with their CONTENT, every other
    * tag becomes a space (block boundaries must separate words, not
    * glue them), the named/numeric entities that dominate real pages
    * decode, whitespace collapses to single spaces, trimmed.
    * `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;` —
    * the double-escape a page shows as text must stay text. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** `<title>` contents (first match), null when absent. */
  def htmlTitle(html: Column): Column = {
    val t = trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1), "\\s+", " "))
    when(t === "", lit(null)).otherwise(t)
  }
}
