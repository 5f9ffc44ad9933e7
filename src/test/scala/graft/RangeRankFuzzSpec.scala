package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeRank

/** Randomized-shape equivalence for the whole RangeRank family vs the
  * single-partition window spellings it replaces. The fixtures and
  * property specs pin specific shapes; this hammers the parameter
  * space the fixtures don't reach — degenerate key cardinality (every
  * row tied), group counts from 1 up, tiny bucket counts, NULL keys,
  * and lookbacks larger than buckets. Seeded LCG trials (the
  * TopKAggPropertySpec discipline) keep runs deterministic.
  */
class RangeRankFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private var seed = 20260814L
  private def next(mod: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (math.abs(seed >>> 17) % mod).toInt
  }

  test("withRankAscGrouped: random groups/cardinality/buckets/nulls vs window") {
    for (trial <- 1 to 4) {
      val n = 1500 + next(2000)
      val g = 1 + next(6)
      val kCard = Seq(1, 2, 7, 997)(next(4))
      val buckets = Seq(2, 3, 8, 64)(next(4))
      val df = spark.range(n).select(
        (col("id") % g).cast("string").as("g"),
        when(col("id") % 13 === 0, lit(null).cast("long"))
          .otherwise(pmod(col("id") * 2654435761L, lit(kCard))).as("k"),
        col("id"))
      val got = RangeRank.withRankAscGrouped(df, Seq("g"), "k",
        Seq(col("id").asc), "rnk", buckets = buckets,
        totalOut = Some("tot"))
      val w = Window.partitionBy(col("g"))
        .orderBy(col("k").asc_nulls_last, col("id").asc)
      val wc = Window.partitionBy(col("g"))
      val bad = got
        .withColumn("exp", row_number().over(w).cast("long"))
        .withColumn("texp", count(lit(1)).over(wc))
        .where(col("rnk") =!= col("exp") || col("tot") =!= col("texp"))
        .count()
      assert(bad == 0,
        s"trial $trial (n=$n g=$g kCard=$kCard buckets=$buckets): $bad mismatches")
    }
  }

  test("withRankMajorDesc + withRunningMaxDescExclusive: random shapes vs windows") {
    for (trial <- 1 to 3) {
      val n = 1500 + next(2000)
      val majCard = Seq(1, 3, 11)(next(3))
      val buckets = Seq(2, 5, 32)(next(3))
      val df = spark.range(n).select(
        pmod(col("id") * 40503L, lit(majCard)).as("m"), col("id"))
      val got = RangeRank.withRankMajorDesc(df, "m", "id", "r",
        buckets = buckets)
      val w = Window.orderBy(col("m").desc, col("id").asc)
      val bad = got.withColumn("exp", row_number().over(w).cast("long"))
        .where(col("r") =!= col("exp")).count()
      assert(bad == 0, s"major trial $trial: $bad mismatches")

      val pts = spark.range(800 + next(800)).select(
        pmod(col("id") * 2654435761L, lit(100003)).cast("double").as("x"),
        pmod(col("id") * 48271L, lit(503)).as("y"))
        .groupBy(col("x")).agg(max(col("y")).as("y"))
      val gotM = RangeRank.withRunningMaxDescExclusive(pts, "x", col("y"),
        "mx", buckets = buckets)
      val wx = Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val badM = gotM.withColumn("exp", max(col("y")).over(wx))
        .where(!(col("mx") <=> col("exp"))).count()
      assert(badM == 0, s"runmax trial $trial: $badM mismatches")
    }
  }

  test("boundedFrameStage: random lookback/buckets incl. lookback >> bucket size") {
    for (trial <- 1 to 3) {
      val n = 600 + next(600)
      val g = 1 + next(4)
      val lookback = Seq(1, 5, 40)(next(3))
      val buckets = Seq(3, 16, 64)(next(3))
      val df = spark.range(n).select(
        (col("id") % g).cast("string").as("g"),
        col("id").as("k"),
        pmod(col("id") * 40503L, lit(977)).as("v"))
      val (staged, wb) = RangeRank.boundedFrameStage(df, Seq("g"), "k", "k",
        lookback = lookback, buckets = buckets)
      val w = wb.rowsBetween(-lookback, Window.currentRow)
      val got = staged
        .withColumn("s", sum(col("v")).over(w))
        .where(!col("__rr_carry"))
        .select(col("g"), col("k"), col("s"))
      val wg = Window.partitionBy(col("g")).orderBy(col("k").asc)
        .rowsBetween(-lookback, Window.currentRow)
      val exp = df.withColumn("se", sum(col("v")).over(wg))
        .select(col("g"), col("k"), col("se"))
      val bad = got.join(exp, Seq("g", "k"))
        .where(!(col("s") <=> col("se"))).count()
      assert(bad == 0,
        s"frame trial $trial (n=$n g=$g lb=$lookback b=$buckets): $bad mismatches")
      assert(got.count() == n, "row multiplicity must be preserved")
    }
  }
}
