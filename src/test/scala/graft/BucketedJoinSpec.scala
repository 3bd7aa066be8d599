package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join scale path from SCALE.md: bucketing both fact
  * tables on the join key removes the join-time shuffle entirely — at
  * 100 TB this is the difference between moving terabytes per join and
  * moving nothing. Asserted structurally: the bucketed join plans zero
  * hash-partition exchanges, the unbucketed one plans two.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val SF = "/root/testdata/sf0.001"

  /** hash exchanges on the JOIN keys in the final (post-AQE) plan; the
    * aggregation's own exchange on o_orderpriority is expected. */
  private def joinKeyExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(finalPlan).length
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ shape
    try {
      spark.read.parquet(s"$SF/lineitem.parquet")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      spark.read.parquet(s"$SF/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plain = spark.read.parquet(s"$SF/lineitem.parquet")
        .join(spark.read.parquet(s"$SF/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()

      // same answer...
      assert(bucketed.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
      // ...but the bucketed join itself moves no data
      assert(joinKeyExchanges(bucketed) == 0,
        s"bucketed join should shuffle nothing:\n${bucketed.queryExecution.executedPlan}")
      assert(joinKeyExchanges(plain) >= 2, "unbucketed baseline should shuffle both sides")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
