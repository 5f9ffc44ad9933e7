package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringSimHelpers
import graft.functions.GraftFunctions.{
  jaro_sim, jaro_winkler_sim, damerau_levenshtein, lev_bytes, char_jaccard,
  hamming_dist}

/** String-similarity kernels (functions/StringSimExpressions.scala).
  *
  * Two layers: (1) goldens probed from DuckDB's builtins of the same
  * name (the oracle engine — every value below was read off
  * `duckdb.sql(...)` before landing), pinning the semantic corners
  * where published implementations disagree; (2) the same kernels
  * through the registered Catalyst expressions over a DataFrame, so
  * the CODEGEN path (not just nullSafeEval) computes every row, plus
  * metric identities that hold for any input (symmetry, bounds,
  * triangle-ish dominance relations between the metrics).
  */
class StringSimSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("jaro goldens match DuckDB jaro_similarity corners") {
    // window clamp at 0: 1-char identical strings are 1.0 not 0.0
    assert(StringSimHelpers.jaro(u("b"), u("b")) == 1.0)
    // ...and adjacent transposed 2-char strings get NO match (window 0)
    assert(StringSimHelpers.jaro(u("ab"), u("ba")) == 0.0)
    // empty => 0.0, including empty-empty (NOT 1.0)
    assert(StringSimHelpers.jaro(u(""), u("")) == 0.0)
    assert(StringSimHelpers.jaro(u(""), u("x")) == 0.0)
    // a transposition inside the window
    assert(StringSimHelpers.jaro(u("acb"), u("abc")) == 0.5555555555555555)
    // byte-oriented: 2-byte £ vs 3-byte € (DuckDB scans bytes too)
    assert(StringSimHelpers.jaro(u("£x"), u("€x")) ==
      0.5277777777777778)
  }

  test("jaro-winkler goldens: the two classic pairs, bit-exact") {
    assert(StringSimHelpers.jaroWinkler(u("MARTHA"), u("MARHTA")) ==
      0.9611111111111111)
    assert(StringSimHelpers.jaroWinkler(u("DIXON"), u("DICKSONX")) ==
      0.8133333333333332)
    // below the 0.7 gate the boost must NOT apply even with a shared
    // prefix... ("ab","ba" has jaro 0 — no prefix either)
    assert(StringSimHelpers.jaroWinkler(u("ab"), u("ba")) == 0.0)
    // prefix cap at 4: 5 shared leading bytes count as 4
    val j = StringSimHelpers.jaro(u("abcdef"), u("abcdex"))
    assert(StringSimHelpers.jaroWinkler(u("abcdef"), u("abcdex")) ==
      j + 4 * 0.1 * (1.0 - j))
  }

  test("damerau-levenshtein is the UNRESTRICTED variant") {
    // the canonical discriminator: OSA gives 3, Lowrance-Wagner gives 2
    assert(StringSimHelpers.damerauLevenshtein(u("ca"), u("abc")) == 2)
    assert(StringSimHelpers.damerauLevenshtein(u(""), u("abc")) == 3)
    assert(StringSimHelpers.damerauLevenshtein(u("abc"), u("")) == 3)
    assert(StringSimHelpers.damerauLevenshtein(u("ab"), u("ba")) == 1)
    // byte-oriented: £ (2 bytes) -> € (3 bytes) is 3 byte edits
    assert(StringSimHelpers.damerauLevenshtein(u("£"), u("€")) == 3)
    // DP guard refuses document-sized input rather than allocating n*m
    val big = UTF8String.fromString("x" * 10001)
    intercept[IllegalArgumentException] {
      StringSimHelpers.damerauLevenshtein(big, u("y"))
    }
  }

  test("lev_bytes is byte-oriented where Spark's builtin walks code points") {
    // the fuzz-found divergence, pinned: one 2-byte char -> one 3-byte
    // char is 3 byte edits but 1 code-point edit
    assert(StringSimHelpers.levBytes(u("£"), u("€")) == 3)
    assert(UTF8String.fromString("£").levenshteinDistance(
      UTF8String.fromString("€")) == 1) // Spark's own kernel, for contrast
    assert(StringSimHelpers.levBytes(u("kitten"), u("sitting")) == 3)
    assert(StringSimHelpers.levBytes(u(""), u("ab")) == 2)
    intercept[IllegalArgumentException] {
      StringSimHelpers.levBytes(UTF8String.fromString("x" * 10001), u("y"))
    }
  }

  test("char-jaccard and hamming corners") {
    assert(StringSimHelpers.charJaccard(u("ab"), u("ba")) == 1.0)
    assert(StringSimHelpers.charJaccard(u(""), u("a")) == 0.0)
    // disjoint byte sets across multibyte chars
    assert(StringSimHelpers.charJaccard(u("£"), u("€")) == 0.0)
    assert(StringSimHelpers.hamming(u("abc"), u("abd")) == 1)
    assert(StringSimHelpers.hamming(u("abc"), u("abcd")) == -1)
    // BYTE length equality, not char count: £ vs € differ
    assert(StringSimHelpers.hamming(u("£"), u("€")) == -1)
  }

  test("codegen path agrees with the helpers and the metric identities hold") {
    val rng = new scala.util.Random(20260815)
    val alpha = "abcdeABC £€"
    def word(): String =
      (0 until rng.nextInt(12)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    val pairs = Seq.tabulate(400) { i =>
      val a = word()
      // half the pairs are perturbations of a (transpose/dup/truncate)
      val b =
        if (i % 2 == 0) word()
        else if (a.length >= 2) { val k = rng.nextInt(a.length - 1)
          a.updated(k, a(k + 1)).updated(k + 1, a(k)) }
        else a + "x"
      (a, b)
    }
    import spark.implicits._
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        jaro_sim(col("a"), col("b")).as("jaro"),
        jaro_sim(col("b"), col("a")).as("jaro_rev"),
        jaro_winkler_sim(col("a"), col("b")).as("jw"),
        damerau_levenshtein(col("a"), col("b")).as("dlev"),
        lev_bytes(col("a"), col("b")).as("lev"),
        char_jaccard(col("a"), col("b")).as("jac"),
        char_jaccard(col("b"), col("a")).as("jac_rev"),
        hamming_dist(col("a"), col("b")).as("ham"))
    val rows = df.collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (jaro, jaroRev, jw) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (dlev, lev) = (r.getInt(5), r.getInt(6))
      val (jac, jacRev, ham) = (r.getDouble(7), r.getDouble(8), r.getInt(9))
      // codegen == interpreted helper, bit-exact
      assert(jaro == StringSimHelpers.jaro(u(a), u(b)), s"($a,$b)")
      assert(jw == StringSimHelpers.jaroWinkler(u(a), u(b)), s"($a,$b)")
      assert(dlev == StringSimHelpers.damerauLevenshtein(u(a), u(b)), s"($a,$b)")
      assert(lev == StringSimHelpers.levBytes(u(a), u(b)), s"($a,$b)")
      assert(jac == StringSimHelpers.charJaccard(u(a), u(b)), s"($a,$b)")
      assert(ham == StringSimHelpers.hamming(u(a), u(b)), s"($a,$b)")
      // identities
      assert(jaro == jaroRev && jac == jacRev, s"symmetry ($a,$b)")
      assert(jaro >= 0.0 && jaro <= 1.0 && jw >= jaro && jw <= 1.0)
      assert(jac >= 0.0 && jac <= 1.0)
      // Damerau allows a superset of Levenshtein's edits
      assert(dlev <= lev, s"dlev $dlev > lev $lev for ($a,$b)")
      // equal byte length: substitutions alone achieve hamming
      val sameLen = u(a).getBytes.length == u(b).getBytes.length
      if (sameLen) assert(ham >= 0 && dlev <= ham, s"($a,$b)")
      else assert(ham == -1)
      if (a == b) assert(jaro == (if (a.isEmpty) 0.0 else 1.0) && dlev == 0)
    }
    // NULL in => NULL out on every kernel
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaro_sim(col("a"), col("b")).as("j"),
        jaro_winkler_sim(col("a"), col("b")).as("jw"),
        damerau_levenshtein(col("a"), col("b")).as("d"),
        char_jaccard(col("a"), col("b")).as("c"),
        hamming_dist(col("a"), col("b")).as("h"))
      .collect()(0)
    (0 until 5).foreach(i => assert(nulls.isNullAt(i)))
  }
}
