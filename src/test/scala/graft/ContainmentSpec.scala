package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** containment_dup: the capability Jaccard dedup structurally lacks —
  * a short document embedded verbatim in a long one scores containment
  * 1.0 while its Jaccard stays far below any sane resemblance
  * threshold. Built on a constructed quote-in-article fixture because
  * the synthetic corpus has near-uniform document lengths (little
  * natural containment).
  */
class ContainmentSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_contain_").toString
    val quote = (1 to 12).map(i => s"tok$i").mkString(" ")
    val article = ((100 to 280).map(i => s"w$i") :+ quote).mkString(" ")
    val other = (500 to 700).map(i => s"z$i").mkString(" ")
    Seq(
      (1L, quote, "en", "web", quote.length.toLong),
      (2L, article, "en", "web", article.length.toLong),
      (3L, other, "en", "web", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("verbatim quote in a long article: containment 1.0, jaccard << 0.5") {
    val rows = operators.Dedup.containmentDup(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // every one of the quote's shingles appears in the article
    assert(r.getDouble(3) == 1.0, s"c_a_in_b = ${r.getDouble(3)}")
    // ...but the article's shingle set is ~19x larger
    assert(r.getDouble(4) < 0.1, s"c_b_in_a = ${r.getDouble(4)}")
    // and resemblance dedup at its own registered threshold misses it
    val jac = operators.Dedup.dedupNgramJaccard(spark, dir).collect()
    assert(jac.isEmpty, s"jaccard >= 0.5 should find nothing: ${jac.toSeq}")
  }

  test("registered corpus query stays deterministic and bounded") {
    val sf = "/root/testdata/sf0.001"
    val a = operators.Dedup.containmentDup(spark, sf).collect().toSet
    val b = operators.Dedup.containmentDup(spark, sf).collect().toSet
    assert(a == b)
    a.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
      assert(math.max(r.getDouble(3), r.getDouble(4)) >= 0.5)
    }
  }
}
