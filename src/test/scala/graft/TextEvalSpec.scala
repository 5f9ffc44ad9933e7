package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** rouge_bleu_eval (operators/TextEval.scala): a from-scratch Scala
  * model — plain collections, textbook clipped-count definitions, no
  * shared spelling with the engine's HOF pipeline — recomputes every
  * metric for a sample of fixture docs. The oracle already pins
  * Spark==DuckDB; this pins both against the DEFINITION (a shared
  * misreading of, say, the clipping rule would pass the oracle and
  * fail here).
  */
class TextEvalSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def clipped(cand: Seq[String], ref: Seq[String]): Long = {
    val rc = ref.groupBy(identity).view.mapValues(_.size)
    cand.groupBy(identity).map { case (g, xs) =>
      math.min(xs.size, rc.getOrElse(g, 0))
    }.sum.toLong
  }

  test("rouge/bleu metrics match a textbook model on fixture docs") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(25).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("rouge_bleu_eval")(spark, sf)
      .collect().filter(r => texts.contains(r.getLong(0)))
    assert(got.length == texts.size)
    got.foreach { r =>
      val d = r.getLong(0)
      val ref = texts(d).split(" ", -1).toSeq
      val cand = ref.indices.filter(_ % 2 == 0)
        .map(i => if (i % 10 == 0) ref(i).toUpperCase else ref(i))
      val ref2 = ref.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val cand2 = cand.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val (c1, c2) = (clipped(cand, ref), clipped(cand2, ref2))
      assert(r.getLong(1) == ref.size && r.getLong(2) == cand.size, s"doc $d")
      assert(r.getLong(3) == c1 && r.getLong(4) == c2, s"doc $d clipping")
      assert(r.getDouble(5) == c1.toDouble / cand.size, s"doc $d p")
      assert(r.getDouble(6) == c1.toDouble / ref.size, s"doc $d r")
      val f1 = if (c1 == 0) 0.0 else 2.0 * c1 / (cand.size + ref.size)
      assert(r.getDouble(7) == f1, s"doc $d f1")
      val f2 = if (c2 == 0 || cand2.isEmpty || ref2.isEmpty) 0.0
        else 2.0 * c2 / (cand2.size + ref2.size)
      assert(r.getDouble(8) == f2, s"doc $d f2")
      val bleu = if (c1 == 0 || c2 == 0 || cand2.isEmpty) 0.0
        else math.min(1.0, cand.size.toDouble / ref.size) *
          math.sqrt((c1.toDouble / cand.size) * (c2.toDouble / cand2.size))
      assert(r.getDouble(9) == bleu, s"doc $d bleu")
      // the fixture must actually exercise clipping and misses
    }
    // across the sample: at least one doc has a non-trivial miss
    // (upper-cased token absent from ref) and some bigram overlap
    assert(got.exists(_.getDouble(5) < 1.0), "no unigram miss exercised")
    assert(got.exists(_.getLong(4) > 0), "no bigram overlap exercised")
  }

  test("span_corrupt: splicing targets into inputs reconstructs the original") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(30).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("span_corrupt")(spark, sf)
      .collect().filter(r => texts.contains(r.getLong(0)))
    assert(got.length == texts.size)
    val sentinel = "<extra_id_(\\d+)>".r
    got.foreach { r =>
      val (d, nSpans) = (r.getLong(0), r.getLong(2))
      val (inputs, targets) = (r.getString(3), r.getString(4))
      // parse targets: sentinel-delimited span texts, k -> tokens
      val marks = sentinel.findAllMatchIn(targets).toSeq
      assert(marks.last.group(1).toLong == nSpans, s"doc $d: no closing sentinel")
      val spans = marks.sliding(2).filter(_.size == 2).map { case Seq(a, b) =>
        a.group(1).toInt -> targets.substring(a.end, b.start).trim
      }.toMap
      assert(spans.size == nSpans, s"doc $d: span count")
      // splice each span back in place of its sentinel in inputs
      val rebuilt = sentinel.replaceAllIn(inputs,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toInt)))
      assert(rebuilt == texts(d), s"doc $d: reconstruction failed")
      // masked spans are 3 tokens each
      spans.values.foreach(s => assert(s.split(" ").length == 3, s"doc $d"))
    }
    // the fixture actually produces spans somewhere
    assert(got.exists(_.getLong(2) > 0), "no document got any span masked")
  }
}
