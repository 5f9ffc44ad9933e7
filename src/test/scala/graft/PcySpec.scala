package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCY candidate pruning (functions/PcyExpressions.scala): the sketch
  * is an UPPER bound, so prune-then-exact-count must return exactly
  * the direct exact count for every threshold — including under heavy
  * bucket collision (tiny sketch) and counter saturation.
  */
class PcySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def directCounts(sets: org.apache.spark.sql.DataFrame, min: Int) =
    sets.select(explode(col("items")).as("ia"), col("items"))
      .select(col("ia"), explode(col("items")).as("ib"))
      .where(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("co"))
      .where(col("co") >= min)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def mkSets(entities: Int, itemsPer: Int, vocab: Int) = {
    import spark.implicits._
    // deterministic pseudo-random membership: entity e holds item i
    // iff a fixed mix of (e, i) clears a modulus — reproducible and
    // collision-rich at small vocab
    (0 until entities).map { e =>
      val items = (0 until vocab)
        .filter(i => ((e * 2654435761L + i * 40503L) % 97) < itemsPer)
        .map(_.toLong)
      (e.toLong, items)
    }.toDF("u", "items").where(size(col("items")) > 1)
  }

  test("pruned pair counts equal direct pair counts at several thresholds") {
    val sets = mkSets(entities = 300, itemsPer = 12, vocab = 80)
    for (min <- Seq(1, 2, 4, 9)) {
      val direct = directCounts(sets, min)
      val pruned = graft.operators.Recommend.pairCounts(sets, min, usePcy = true)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(pruned == direct, s"mismatch at min=$min")
    }
  }

  test("tiny sketch (max collisions) still exact — bound only ever over-counts") {
    val sets = mkSets(entities = 200, itemsPer = 10, vocab = 60)
    val direct = directCounts(sets, 3)
    // 2^8 buckets for thousands of distinct pairs: nearly every bucket
    // aggregates many pairs, so the prune keeps almost everything —
    // but the exact post-count must still match exactly
    val pruned = graft.operators.Recommend.pairCounts(sets, 3, bits = 8, usePcy = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pruned == direct)
  }

  test("saturated counters (127 cap) never drop a qualifying pair") {
    import spark.implicits._
    // one hot pair present in 400 entities — bucket saturates at 127,
    // far above any threshold that fits the byte counters
    val sets = (0 until 400).map(e => (e.toLong, Seq(7L, 9L)))
      .toDF("u", "items")
    val got = graft.operators.Recommend.pairCounts(sets, 100, bits = 8, usePcy = true).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) == (7L, 9L, 400L))
  }

  test("pcy_sketch SQL surface: bucket counts bound pair multiplicity") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    df.createOrReplaceTempView("pcy_keys")
    val sk = spark.sql(
      "SELECT pcy_sketch(xxhash64(k), 12) AS sk FROM pcy_keys")
      .head.getAs[Array[Byte]](0)
    assert(sk.length == 4096)
    assert(sk.map(_.toInt).sum == 5)
  }
}
