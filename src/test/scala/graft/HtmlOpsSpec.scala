package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlOps

/** HtmlOps markup-stripping hazards: content-dropping blocks, raw '<'
  * inside scripts, entity decode ordering, whitespace normalization,
  * and codegen (regexp chain must inline, no UDF).
  */
class HtmlOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def extract(html: String): (String, String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(HtmlOps.htmlToText(col("h")).as("t"), HtmlOps.htmlTitle(col("h")).as("ti"))
      .collect()(0)
    (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))
  }

  test("tags become spaces; script/style/comment content drops") {
    val (t, ti) = extract(
      "<html><head><title>A  B</title><style>p{x:1}</style></head>" +
        "<body><h1>Hi</h1><!-- secret --><p>one<b>two</b>three</p>" +
        "<script>if (1 < 2) { alert('gone') }</script></body></html>")
    assert(t == "A B Hi one two three")
    assert(ti == "A B")
  }

  test("entities decode; &amp;-escaped entities stay literal text") {
    val (t, _) = extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; &amp;lt;f</p>")
    assert(t == "a <b> \"c\" 'd' e & &lt;f")
  }

  test("case-insensitive tags, multiline blocks, missing title -> null") {
    val (t, ti) = extract("<DIV>x</DIV><SCRIPT>\nvar a;\n</SCRIPT><P>y</P>")
    assert(t == "x y")
    assert(ti == null)
  }

  test("plain text passes through trimmed") {
    val (t, _) = extract("  just   words  ")
    assert(t == "just words")
  }

  test("extraction stays inside WholeStageCodegen (no UDF)") {
    import spark.implicits._
    val plan = Seq("<p>x</p>").toDF("h")
      .select(HtmlOps.htmlToText(col("h")).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
