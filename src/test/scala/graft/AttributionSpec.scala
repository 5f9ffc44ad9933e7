package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

/** Hand-derivable fixture for last-touch attribution: the oracle pins
  * engine parity on the big fixture; this pins the SEMANTICS —
  * last preceding non-purchase wins, consecutive purchases share that
  * touch, a first-event purchase is 'direct', and attribution never
  * crosses users.
  */
class AttributionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("last-touch: per-user carry-forward, direct fallback") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    // (event_id, ts-second, user, type, value)
    val rows = Seq(
      // user 1: click -> purchase(10) -> purchase(5)  => click gets both
      (1L, 1L, 1L, "click", 0.0), (2L, 2L, 1L, "purchase", 10.0),
      (3L, 3L, 1L, "purchase", 5.0),
      // user 2: purchase(7) first => direct; then view -> purchase(3)
      (4L, 1L, 2L, "purchase", 7.0), (5L, 2L, 2L, "view", 0.0),
      (6L, 3L, 2L, "purchase", 3.0),
      // user 3: view only, no purchase => contributes nothing
      (7L, 1L, 3L, "view", 0.0))
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Behavior.attributionLastTouch(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue"))).toMap
    assert(got == Map(
      "click" -> (2L, 15.0),   // user 1's two purchases
      "direct" -> (1L, 7.0),   // user 2's first-event purchase
      "view" -> (1L, 3.0)))    // user 2's post-view purchase
  }
}
