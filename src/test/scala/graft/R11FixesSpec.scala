package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scaling

/** Round-11 review fixes: the half-even rounding contract of
  * scaled_sizes_ref (DuckDB `::INTEGER` on DOUBLE is round-to-nearest-
  * EVEN — 0.5→0, 2.5→2, verified on DuckDB 1.0.0 — so the engine must
  * use bround, not round) and the bounded capped_collect aggregate.
  */
class R11FixesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Events fixture whose group sizes make size*10000/total an EXACT
    * .5 — the case where half-up and half-even diverge.
    */
  private def halfShareFixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r11half").toString
    // sizes {5, 27}, total 32: shares 1562.5 and 8437.5 exactly
    // (x/32 is binary-representable, so the doubles are exact halves)
    val rows = (1 to 5).map(u => (u.toLong, u.toLong, "a", 1.0)) ++
      (1 to 27).map(u => (u.toLong + 100, u.toLong, "b", 1.0))
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id"))) // distinct ts
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("scaled_sizes_ref rounds exact halves to even, like the reference's ::INTEGER") {
    val out = Scaling.scaledSizesRef(spark, halfShareFixture())
      .collect().map(r => r.getAs[String]("event_type")
        -> r.getAs[Long]("scaled_size")).toMap
    // half-even: 1562.5 → 1562, 8437.5 → 8438 (sum hits 10000 with no
    // repair bumps). Half-up would give 1563 + 8438 = 10001 — the
    // overshoot the reference's assert can never repair.
    assert(out == Map("a" -> 1562L, "b" -> 8438L), out.toString)
    assert(out.values.sum == 10000L)
  }

  test("capped_collect keeps every element within the cap, at most cap+1 over it") {
    import spark.implicits._
    val df = ((1 to 7).map(i => ("small", i.toLong)) ++
      (1 to 500).map(i => ("hot", i.toLong)))
      .toDF("g", "v")
      .repartition(4)
      .groupBy(col("g"))
      .agg(call_function("capped_collect", struct(col("v")), lit(10)).as("xs"))
      .select(col("g"), size(col("xs")).as("n"),
        col("xs.v").as("vs"))
    val rows = df.collect().map(r => r.getAs[String]("g") -> r).toMap
    // within cap: ALL elements retained (order-free — gate consumers
    // explode and re-aggregate)
    assert(rows("small").getAs[Int]("n") == 7)
    assert(rows("small").getSeq[Long](rows("small").fieldIndex("vs"))
      .sorted.toList == (1L to 7L).toList)
    // over cap: retention stops at cap+1 — enough for a size() gate to
    // discard the group, bounded memory regardless of group heat
    assert(rows("hot").getAs[Int]("n") == 11)
  }

  test("min_k_distinct == slice(sort_array(collect_set), 1, k) on every group") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i % 37, (i * 7919L) % 211))
      .toDF("g", "v").repartition(8)
    val both = df.groupBy(col("g"))
      .agg(call_function("min_k_distinct", col("v"), lit(5)).as("bounded"),
        slice(sort_array(collect_set(col("v"))), 1, 5).as("reference"))
      .where(not(col("bounded") === col("reference")))
    assert(both.count() == 0, both.collect().mkString("\n"))
    // and the full-set case: k above the distinct count returns the
    // complete sorted distinct set (collect_set equivalence)
    val full = df.groupBy(col("g"))
      .agg(call_function("min_k_distinct", col("v"), lit(1000)).as("b"),
        sort_array(collect_set(col("v"))).as("r"))
      .where(not(col("b") === col("r")))
    assert(full.count() == 0)
  }

  test("capped_collect survives the exchange (serialize/deserialize round-trip)") {
    import spark.implicits._
    // force non-partial path diversity: many partitions, tiny groups
    val out = (1 to 200).map(i => (i % 50, i.toLong)).toDF("g", "v")
      .repartition(16)
      .groupBy(col("g"))
      .agg(call_function("capped_collect", struct(col("v")), lit(10)).as("xs"))
      .select(explode(col("xs.v")).as("v"))
      .agg(sum(col("v"))).collect()(0).getLong(0)
    assert(out == (1 to 200).map(_.toLong).sum)
  }
}
