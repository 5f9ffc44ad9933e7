package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 connector contract for `ping_gen`: distributed
  * planning, determinism under any partitioning, and real filter
  * pushdown (predicate narrows what gets GENERATED, not just what
  * survives a post-scan filter).
  */
class PingGenSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gen(parts: Int = 8) =
    spark.read.format("ping_gen")
      .option("users", 40).option("days", 2).option("pings", 5)
      .option("numPartitions", parts)
      .load()

  test("cardinality and schema") {
    val df = gen()
    assert(df.count() == 40L * 2 * 5)
    assert(df.schema.fieldNames.toSeq ==
      Seq("user_id", "ts", "lat", "lon", "accuracy"))
    assert(df.rdd.getNumPartitions == 8, "planning must be distributed")
  }

  test("identical content for any partition count") {
    val a = gen(parts = 3)
    val b = gen(parts = 11)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "the relation is a pure function of the logical indices")
  }

  test("user_id predicates push into generation") {
    val df = gen().where(col("user_id") >= 10 && col("user_id") < 15)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("users=[10,15)"),
      s"range must narrow at planning time: ${plan.take(1500)}")
    assert(df.count() == 5L * 2 * 5)

    val eq = gen().where(col("user_id") === 7)
    assert(eq.queryExecution.executedPlan.toString.contains("users=[7,8)"))
    assert(eq.count() == 2L * 5)

    // unsupported predicates stay residual and still evaluate correctly
    val res = gen().where(col("user_id") % 2 === 0)
    assert(res.count() == 20L * 2 * 5)
  }

  test("degenerate configs plan an empty scan, never phantom rows") {
    def gen0(users: Int, days: Int, pings: Int) =
      spark.read.format("ping_gen")
        .option("users", users).option("days", days).option("pings", pings)
        .load()
    assert(gen0(40, 2, 0).count() == 0, "pings=0")
    assert(gen0(40, 0, 5).count() == 0, "days=0")
    assert(gen0(0, 2, 5).count() == 0, "users=0")
    // pushdown collapsing the range to empty must also yield zero rows
    assert(gen().where(col("user_id") >= 1000).count() == 0)
  }

  test("blackhole sink runs the distributed commit protocol and counts committed rows") {
    graft.sources.Blackhole.reset("t1")
    val df = gen(parts = 6)
    df.write.format("blackhole").option("name", "t1").mode("append").save()
    assert(graft.sources.Blackhole.rowsWritten("t1") == 40L * 2 * 5,
      "driver commit must aggregate every partition's writer count")
    // second write accumulates (append semantics)
    df.where(col("user_id") < 4).write.format("blackhole")
      .option("name", "t1").mode("append").save()
    assert(graft.sources.Blackhole.rowsWritten("t1") == 40L * 2 * 5 + 4L * 2 * 5)
    assert(graft.sources.Blackhole.rowsWritten("never-written") == 0L)
    // overwrite mode truncates with the commit, then records the new write
    df.where(col("user_id") < 2).write.format("blackhole")
      .option("name", "t1").mode("overwrite").save()
    assert(graft.sources.Blackhole.rowsWritten("t1") == 2L * 2 * 5,
      "overwrite must reset the committed count, not accumulate")
  }

  test("field derivations match the portable hash formula") {
    val r = gen().where(col("user_id") === 0).orderBy(col("ts").asc).head()
    // recompute one row's fields straight from the spec'd formula
    def h(s: String) = graft.sources.PingGen.hash60(s)
    val rows = for (d <- 0 until 2; i <- 0 until 5) yield {
      val key = s"0:$d:$i"
      ((graft.sources.PingGen.EpochStart + d * 86400L
        + h(s"p:$key") % 86400L) * 1000000L,
        19.0 + (h(s"lat:$key") % 1000000L) / 1000000.0)
    }
    val (minTs, lat) = rows.minBy(_._1)
    assert(r.getTimestamp(1).getTime * 1000 == minTs
      || r.getTimestamp(1).toInstant.toEpochMilli * 1000 == minTs)
    assert(r.getDouble(2) == lat)
  }
}
