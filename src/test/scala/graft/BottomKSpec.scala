package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The custom bottom_k_by_key TypedImperativeAggregate
  * (functions/BottomKByKey.scala): equivalence with the row_number
  * window formulation on random multi-partition input (exercising the
  * partial-buffer merge and serialize/deserialize paths), plus edges
  * the gate entry can't hit. */
class BottomKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("matches the row_number window formulation across partitions") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    // 2000 rows, 7 groups, adversarial key ties (key = id % 13 forces
    // many equal keys so the (key, id) tiebreak matters), 16 input
    // partitions so partial buffers serialize and merge
    val rows = (0 until 2000).map { i =>
      (s"g${rnd.nextInt(7)}", i.toLong, (i % 13).toLong)
    }
    val df = rows.toDF("g", "id", "hk").repartition(16)
    df.createOrReplaceTempView("bk_rows")
    val got = spark.sql(
      """SELECT g, explode(bottom_k_by_key(hk, id, 9)) AS id
        FROM bk_rows GROUP BY g""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = spark.sql(
      """SELECT g, id FROM (
          SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY hk, id) AS rn
          FROM bk_rows) WHERE rn <= 9""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.size == 7 * 9)
  }

  test("groups smaller than k return all ids, sorted by (key, id)") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 1L))
      .toDF("g", "id", "hk").createOrReplaceTempView("bk_small")
    val out = spark.sql(
      "SELECT g, bottom_k_by_key(hk, id, 10) AS ids FROM bk_small GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    assert(out.toSeq == Seq("a" -> Seq(2L, 1L), "b" -> Seq(3L)))
  }

  test("null keys and ids are skipped; empty group yields empty array") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a", Some(1L), None: Option[Long]), ("a", Some(2L), Some(7L)),
        ("a", None, Some(9L)))
      .toDF("g", "id", "hk").createOrReplaceTempView("bk_nulls")
    val out = spark.sql(
      "SELECT bottom_k_by_key(hk, id, 3) FROM bk_nulls GROUP BY g")
      .collect().head.getSeq[Long](0)
    assert(out == Seq(2L))
    val empty = spark.sql(
      "SELECT bottom_k_by_key(hk, id, 3) FROM bk_nulls WHERE id IS NULL AND hk IS NULL GROUP BY g")
      .collect()
    assert(empty.isEmpty || empty.head.getSeq[Long](0).isEmpty)
  }

  test("non-positive k and non-integral inputs are rejected") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a", 1L, 1L)).toDF("g", "id", "hk").createOrReplaceTempView("bk_err")
    assertThrows[Exception](spark.sql(
      "SELECT bottom_k_by_key(hk, id, 0) FROM bk_err GROUP BY g").collect())
    assertThrows[Exception](spark.sql(
      "SELECT bottom_k_by_key(g, id, 3) FROM bk_err GROUP BY g").collect())
    // fractional and out-of-int-range k must be REJECTED, not
    // silently truncated by Number.intValue()
    assertThrows[Exception](spark.sql(
      "SELECT bottom_k_by_key(hk, id, 2.9) FROM bk_err GROUP BY g").collect())
    assertThrows[Exception](spark.sql(
      "SELECT bottom_k_by_key(hk, id, 4294967297) FROM bk_err GROUP BY g").collect())
  }
}
