package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.{asof_join, minhash_sig, vec_dot}

/** Round-3 fixes (ADVICE r2): as-of join null-time consumption,
  * minhash_sig overflow-safe k > 8, vec_dot shape errors, star-CC
  * convergence signalling.
  */
class R3Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("as-of join: null right times are consumed non-matches, never cursor blocks") {
    import spark.implicits._
    val left = Seq((1, 10L), (1, 20L), (2, 10L), (3, 10L))
      .toDF("lk", "lt")
    // per key, the null-time row sorts FIRST (Ascending, nulls first):
    // before the fix it permanently blocked the cursor for its key.
    val right = Seq(
      (1, None, "r_null"), (1, Some(5L), "r1"), (1, Some(15L), "r2"),
      (2, None, "r_only_null"),
      (3, Some(3L), "r3"))
      .toDF("rk", "rt", "tag")
    val got = asof_join(left, right, col("lk"), col("rk"), col("lt"), col("rt"))
      .select(col("lk"), col("lt"), col("tag"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (if (r.isNullAt(2)) null else r.getString(2)))
      .toMap
    val want = Map(
      (1, 10L) -> "r1", // greatest rt <= 10 among non-null times
      (1, 20L) -> "r2",
      (2, 10L) -> null, // only a null-time candidate => no match
      (3, 10L) -> "r3")
    assert(got == want, s"asof with null right times wrong: $got")
  }

  test("minhash_sig k=16 matches the exact mod-2^60 closed form (no Long overflow)") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three four five six seven",
      "a b c d")
    val got = texts.toDF("text")
      .select(col("text"), minhash_sig(col("text"), lit(16)).as("sig"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    // independent arithmetic: BigInt closed form h1 + j*h2 mod 2^60
    val mod = BigInt(1) << 60
    def expected(text: String, k: Int): Seq[Long] = {
      val toks = text.split(" ", -1)
      val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
      val mins = Array.fill(k)(Long.MaxValue)
      val md = MessageDigest.getInstance("MD5")
      for (s <- shingles) {
        val hex = md.digest(s.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val h1 = BigInt(hex.substring(0, 15), 16)
        val h2 = BigInt(hex.substring(15, 30), 16)
        var j = 0
        while (j < k) {
          val v = ((h1 + BigInt(j) * h2) mod mod).toLong
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      mins.toSeq
    }
    for (t <- texts)
      assert(got(t) == expected(t, 16),
        s"k=16 signature diverges from BigInt closed form for '$t'")
  }

  test("vec_dot: length mismatch and null elements raise, never truncate") {
    import spark.implicits._
    def rootMessages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e1 = intercept[Exception] {
      mismatch.select(vec_dot(col("a"), col("b"))).collect()
    }
    assert(rootMessages(e1).exists(_.contains("length mismatch")), e1)
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    val e2 = intercept[Exception] {
      withNull.select(vec_dot(col("a"), col("b"))).collect()
    }
    assert(rootMessages(e2).exists(_.contains("null element")), e2)
  }

  test("star CC: unconverged maxRounds throws instead of returning split labels") {
    import spark.implicits._
    import graft.operators.Clustering
    // a 40-node chain cannot reach fixpoint-signature agreement in 1
    // round; maxLocalEdges = 0 forces the distributed star path (the
    // adaptive driver kernel has no round budget to guard)
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Clustering.connectedComponentsStar(edges, maxRounds = 1, maxLocalEdges = 0L)
    }
    // and with the default budget it converges and is correct
    val labels = Clustering.connectedComponentsStar(edges, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (0L to 39L).map(_ -> 0L).toMap)
  }
}
