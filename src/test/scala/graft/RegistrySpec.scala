package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: contributor-error guards over the driver
  * contract itself (SparkEntry). These catch the mistakes the oracle
  * harness would surface only as confusing downstream failures —
  * duplicate names silently shadowing an op in the queries Map,
  * oracles referencing tables the harness never registers, bench ops
  * without oracles.
  */
class RegistrySpec extends AnyFunSuite {

  private val tables = Set("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("op names are unique (Map build must not shadow)") {
    val names = SparkEntry.allOps.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, v) if v.size > 1 => n }
    assert(dups.isEmpty, s"duplicate op names: $dups")
  }

  test("no oracle string is null or blank (object-init-order guard)") {
    // a Seq[Op] val that references an oracle string declared LATER in
    // its object captures null at init — Verify then NPEs mid-run.
    // Surface it here with the op's name instead.
    val bad = SparkEntry.allOps
      .filter(o => o.oracle.exists(s => s == null || s.trim.isEmpty))
      .map(_.name)
    assert(bad.isEmpty, s"ops with null/blank oracle SQL: $bad")
    // a not-yet-initialized SPLICED fragment interpolates as the text
    // "null" — e.g. "WITH cte AS (null)" — which no SQL dialect accepts
    val spliced = SparkEntry.allOps
      .filter(o => o.oracle.exists(_.matches("(?s).*\\(\\s*null\\s*\\).*")))
      .map(_.name)
    assert(spliced.isEmpty, s"ops with null-spliced oracle SQL: $spliced")
  }

  test("every oracle references only harness-registered tables") {
    // conservative: any FROM/JOIN <ident> must be a known table or a
    // CTE name defined in the same statement
    val fromRe = """(?i)\b(?:FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)""".r
    // allows an optional CTE column list: name(c1, c2) AS (VALUES ...)
    val cteRe = """(?i)\b([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(""".r
    SparkEntry.allOps.flatMap(o => o.oracle.map(o.name -> _)).foreach {
      case (name, sql) =>
        val ctes = cteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        // DuckDB builtin table functions are valid FROM targets
        val builtins = Set("range", "generate_series", "unnest")
        val unknown = refs -- tables -- ctes -- builtins
        assert(unknown.isEmpty,
          s"$name oracle references unknown relations: $unknown")
    }
  }

  test("no registered query outputs array/struct/map columns (canonizer guard)") {
    // The driver's DuckDB-compare canonizer sorts result cells with
    // pandas and crashes on nested values ("unhashable numpy.ndarray")
    // — hit three times (r1 multimodal_decode_batch, r5 array_hof/
    // inverted_index, r7 embedding_whiten). Close the class: every
    // oracle-carrying op must emit scalar columns only. Ops without an
    // oracle never reach the canonizer, so they may stay nested.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType => ST}
    val spark = Sessions.build("graft-test", "4")
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.allOps.filter(_.oracle.nonEmpty).flatMap { op =>
      val nested = op.run(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[ST] => f.name
      }
      if (nested.isEmpty) None else Some(s"${op.name}(${nested.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"oracle-carrying ops with nested output columns: $offenders")
  }

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    val spark = Sessions.build("graft-test", "4")
    spark.sparkContext.setLogLevel("WARN")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every bench op carries an oracle") {
    val weak = SparkEntry.benchQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(weak.isEmpty, s"bench ops without oracle: $weak")
  }

  test("oracleSql keys are exactly the oracle-carrying ops") {
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.allOps.filter(_.oracle.nonEmpty).map(_.name).toSet)
  }
}
