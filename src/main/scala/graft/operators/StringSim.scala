package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.GraftFunctions._

/** Fuzzy record-linkage scoring — the full string-similarity panel a
  * dedup/entity-resolution pass scores candidate pairs with (the
  * reference's pandas EDA reaches for thefuzz/jellyfish here; see
  * /root/reference/scripts/DataCleaningHandler.py). Spark ships only
  * `levenshtein`; the other five kernels are graft's codegen'd
  * Catalyst expressions (functions/StringSimExpressions.scala), each
  * bit-exact against DuckDB's builtin of the same name.
  *
  * Scale shape: the pair domain is the DISTINCT name vocabulary — a
  * parts CATALOG, bounded by construction (adjective × noun grammar
  * here; any real parts list is ≤ millions while lineitem is
  * billions), never the fact table. Blocking is an equi-join on the
  * name's noun token, so candidate pairs are Σ_block |block|² over
  * catalog-sized blocks — the standard blocked-linkage shape; no
  * corpus×corpus, no broadcast of anything unbounded, and the whole
  * metric panel is one codegen'd projection over the joined pairs.
  */
object StringSim {

  def stringSimPack(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .select(col("p_name").as("name"))
      .where(length(col("name")) > 0)
      .distinct()
      // coalesce to '': a single-token name has no second token, and
      // the two engines disagree about what that means (Spark getItem
      // -> NULL drops the name from the equi-join; DuckDB split_part
      // -> '' groups them) — pin the DuckDB semantics explicitly
      .select(col("name"),
        coalesce(split(col("name"), " ").getItem(1), lit("")).as("block"))
    // shuffle_hash: both sides are the corpus-derived distinct name
    // vocabulary — catalog-sized here but it GROWS with the catalog, so
    // never let fixture-scale AQE bake a broadcast into the shape
    val a = names.select(col("block"), col("name").as("name_a"))
      .hint("shuffle_hash")
    val b = names.select(col("block").as("block_b"), col("name").as("name_b"))
    a.join(b, col("block") === col("block_b") && col("name_a") < col("name_b"))
      .select(
        col("block"), col("name_a"), col("name_b"),
        // lev_bytes, not Spark's builtin: the builtin walks code points
        // while DuckDB walks bytes (fuzz-proven divergence on multibyte)
        lev_bytes(col("name_a"), col("name_b")).cast("long").as("lev"),
        damerau_levenshtein(col("name_a"), col("name_b")).cast("long").as("dlev"),
        jaro_sim(col("name_a"), col("name_b")).as("jaro"),
        jaro_winkler_sim(col("name_a"), col("name_b")).as("jw"),
        char_jaccard(col("name_a"), col("name_b")).as("jac"),
        // BYTE length guard (octet_length/strlen), matching the
        // kernel's own definition — char length would diverge on
        // multibyte names
        when(octet_length(col("name_a")) === octet_length(col("name_b")),
          hamming_dist(col("name_a"), col("name_b")).cast("long"))
          .as("hamming"))
  }

  private val stringSimPackSql =
    """WITH names AS (
      |  SELECT DISTINCT p_name AS name, split_part(p_name, ' ', 2) AS block
      |  FROM part WHERE length(p_name) > 0
      |)
      |SELECT a.block, a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
      |  CAST(damerau_levenshtein(a.name, b.name) AS BIGINT) AS dlev,
      |  jaro_similarity(a.name, b.name) AS jaro,
      |  jaro_winkler_similarity(a.name, b.name) AS jw,
      |  jaccard(a.name, b.name) AS jac,
      |  CASE WHEN strlen(a.name) = strlen(b.name)
      |       THEN CAST(hamming(a.name, b.name) AS BIGINT) END AS hamming
      |FROM names a JOIN names b ON a.block = b.block AND a.name < b.name""".stripMargin

  /** Pair kernels for the cross-engine fuzz (tools/fuzz_string_sim.py
    * via [[graft.DevPairKernelDump]]): Spark Column kernel + the DuckDB
    * expression over columns `a`,`b` computing the identical value.
    * The CASE guards mirror graft's total-function conventions at the
    * corners where DuckDB's builtins throw (empty input for jaccard,
    * unequal byte length for hamming).
    */
  val pairKernelOracles: Map[String, ((Column, Column) => Column, String)] = Map(
    "lev" -> (((a: Column, b: Column) => lev_bytes(a, b).cast("long")),
      "CAST(levenshtein(a, b) AS BIGINT)"),
    "dlev" -> (((a: Column, b: Column) => damerau_levenshtein(a, b).cast("long")),
      "CAST(damerau_levenshtein(a, b) AS BIGINT)"),
    "jaro" -> (((a: Column, b: Column) => jaro_sim(a, b)),
      "jaro_similarity(a, b)"),
    "jw" -> (((a: Column, b: Column) => jaro_winkler_sim(a, b)),
      "jaro_winkler_similarity(a, b)"),
    "jac" -> (((a: Column, b: Column) => char_jaccard(a, b)),
      "CASE WHEN length(a) = 0 OR length(b) = 0 THEN 0.0 ELSE jaccard(a, b) END"),
    "ham" -> (((a: Column, b: Column) => hamming_dist(a, b).cast("long")),
      "CASE WHEN strlen(a) <> strlen(b) THEN CAST(-1 AS BIGINT) " +
        "WHEN strlen(a) = 0 THEN CAST(0 AS BIGINT) " + // ("","") is 0 mismatches; DuckDB throws
        "ELSE CAST(hamming(a, b) AS BIGINT) END"),
  )

  val ops: Seq[Op] = Seq(
    Op("string_sim_pack", stringSimPack, Some(stringSimPackSql)),
  )
}
