package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Engine-internal redundancy for EVERY dialect-common oracle: each
  * registered oracle SQL is attempted through SPARK's own SQL frontend
  * and, when the dialect overlaps (it parses, resolves, and runs),
  * compared row-for-row against the DataFrame spelling. The DuckDB
  * oracle (driver-side) remains the authority; this guard runs on
  * every `sbt test` with no external engine, so a drift between the DF
  * plan and the SQL semantics (a decorrelation bug, a join-condition
  * typo, a window-frame slip) fails CI immediately instead of waiting
  * for the parity harness.
  *
  * Skips are EXCEPTIONS ONLY — DuckDB-specific syntax (list_*,
  * unnest/ntile spellings, regexp_replace 'g' flags) that Spark cannot
  * execute. Any oracle that runs MUST match; at the time of writing
  * 109 of 234 do (r13), and the floor assertion keeps a refactor from
  * silently degrading the sweep into all-skips.
  */
class TpchSqlCrossCheckSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables.load(s, sf, t).createOrReplaceTempView(t)
    s
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      // %.9e = RELATIVE 1e-9 comparison: a fixed %.9f both flakes on
      // large-magnitude aggregates (ulp of 1e10 ≈ 2e-6 — a legitimate
      // partition-order difference between the DF and SQL plans would
      // fail spuriously) and masks sub-1e-9 drift on small values
      case d: Double => f"$d%.9e"
      case b: java.math.BigDecimal => f"${b.doubleValue()}%.9e"
      case x => x.toString
    }.mkString("|")).sorted.toSeq

  test("every dialect-common oracle cross-checks through Spark SQL") {
    var checked, skipped = 0
    val failures = Seq.newBuilder[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val sqlRows =
        try Some(canon(spark.sql(sql)))
        // dialect-only skips; fatal errors (OOM, interrupts) still abort
        catch { case scala.util.control.NonFatal(_) => skipped += 1; None }
      sqlRows.foreach { want =>
        checked += 1
        // DF-side failures are NOT skippable — the engine must run its
        // own registered queries
        val got = canon(SparkEntry.queries(name)(spark, sf))
        if (got.length != want.length)
          failures += s"$name: rows df=${got.length} sql=${want.length}"
        else got.zip(want).zipWithIndex.collectFirst {
          case ((a, b), i) if a != b => s"$name: row $i\n  df : $a\n  sql: $b"
        }.foreach(failures += _)
      }
    }
    val fs = failures.result()
    info(s"cross-checked $checked oracles through Spark SQL ($skipped dialect-skipped)")
    assert(fs.isEmpty, fs.mkString("\n"))
    // ratchet: exactly today's dialect-common count. A query whose
    // Spark-side run REGRESSES into an exception lands in `skipped` and
    // drops this below the floor — raise the floor when adding new
    // dialect-common ops, never lower it without a named reason.
    assert(checked >= 123, // ratcheted 121 → 123 (r21: graph_components, welch_t_test)
      s"dialect-common sweep degraded: only $checked oracles cross-checked")
  }
}
