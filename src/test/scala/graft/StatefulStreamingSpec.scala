package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Custom streaming state via mapGroupsWithState: per-user event counts
  * accumulated across micro-batches (two staged files -> two batches
  * with maxFilesPerTrigger=1). The final state must equal the batch
  * groupBy answer — state survives and composes across triggers.
  */
class StatefulStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sf = "/root/testdata/sf0.001"

    // stage the events in two halves so the file source runs two batches
    val src = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type")
    val staged: Path = Files.createTempDirectory("graft-state")
    src.where(col("user_id") % 2 === 0).coalesce(1)
      .write.parquet(staged.resolve("a").toString)
    src.where(col("user_id") % 2 === 1).coalesce(1)
      .write.parquet(staged.resolve("b").toString)
    val inDir = Files.createTempDirectory("graft-state-in")
    def copyPart(from: Path, name: String): Unit = {
      val part = Files.list(from).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, inDir.resolve(name))
    }
    copyPart(staged.resolve("a"), "batch0.parquet")
    copyPart(staged.resolve("b"), "batch1.parquet")

    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
      .as[(Long, String)]

    val counted = stream
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (uid, n)
      }

    val name = "graft_state_test"
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val q = counted.toDF("user_id", "n").writeStream
      .outputMode(OutputMode.Update).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()

    // last update per user == total count
    val got = spark.table(name)
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = src.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(spark.table(name).count() >= want.size) // saw per-batch updates
  }
}
