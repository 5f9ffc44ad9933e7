package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Web-crawl curation front end: the operators a Common-Crawl-scale
  * training-data pipeline runs BEFORE the text-analysis/dedup families
  * (/root/reference/src/loaders/document_loaders.py ingests already-
  * clean text; a 100 TB crawl feed needs these three steps first).
  *
  * All three kernels are row-local string pipelines over codegen'd
  * built-ins (`regexp_replace`/`replace`/`lower` — no UDFs, no
  * exchange), so they fuse into the scan's WholeStageCodegen span and
  * scale embarrassingly: filter/projection pushdown reaches the
  * parquet scan untouched, and the only shuffle in the family is
  * url_dedup's keep-min aggregation on the canonical key.
  *
  * The documents fixture carries plain text, so each query derives its
  * raw input (HTML scaffold / messy URL) deterministically from the
  * row INSIDE the query — both engines build byte-identical inputs from
  * the same parquet, keeping the kernels oracle-checkable end to end.
  */
object WebCuration {

  // ---------------------------------------------------------------- html

  /** Deterministic HTML scaffold around each document's text: head
    * noise (title/script/style), attribute-carrying tags, and the six
    * standard entities — every hazard class the stripper must handle,
    * including a bare `<` inside script text.
    */
  private def htmlCol: Column =
    concat(lit("<html><head><title>"), col("source"),
      lit("</title><script type=\"text/javascript\">var x = 1 < 2;</script>"),
      lit("<style>.t { color: red; }</style></head><body><h1 class=\"t\">Doc "),
      col("doc_id").cast("string"), lit("</h1><p>"), col("text"),
      lit("</p><div>&amp; &lt;raw&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"))

  // single-line on purpose: these fragments interpolate into
  // stripMargin'd query strings, where a continuation line's leading
  // `|` would be eaten as a margin marker
  private val htmlColSql =
    """'<html><head><title>' || source || '</title><script type="text/javascript">var x = 1 < 2;</script>' || '<style>.t { color: red; }</style></head><body><h1 class="t">Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p><div>&amp; &lt;raw&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>'"""

  /** HTML → text extraction: script/style elements go first (non-greedy
    * content match — their text may contain bare `<`), then tags, then
    * entity unescape (`&amp;` strictly last so double-escaped entities
    * surface as literals, the standard order), then whitespace
    * collapse. Both regex dialects here are the RE2 ∩ java.util.regex
    * common subset; the entity steps are plain `replace` so no dialect
    * is involved at all.
    */
  /** The reusable kernel: apply to ANY string column carrying HTML.
    * Pure Column pipeline — fuses into whatever scan feeds it.
    * Script and style elements strip in SEPARATE passes: a combined
    * `<(script|style)>…</(script|style)>` alternation would cross-match
    * `<script>…</style>`, and the correct fix — a `</\\1>` pattern
    * backreference — does not exist in RE2, so the oracle could never
    * mirror it. `(?s)` (both dialects) lets the element body span
    * newlines.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** The identical strip chain as ONE DuckDB SQL expression over `in` —
    * the single source of truth interpolated into every oracle that
    * strips (html_strip, crawl_pipeline), single-line per the
    * stripMargin interpolation note above.
    */
  private def stripHtmlSqlExpr(in: String): String =
    s"""trim(regexp_replace(replace(replace(replace(replace(replace(replace(regexp_replace(regexp_replace(regexp_replace($in, '(?s)<script[^>]*>.*?</script>', ' ', 'g'), '(?s)<style[^>]*>.*?</style>', ' ', 'g'), '<[^>]*>', ' ', 'g'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'), '\\s+', ' ', 'g'))"""

  def htmlStrip(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(htmlCol).cast("long").as("n_raw"),
        stripHtml(htmlCol).as("text_clean"))
      .withColumn("n_clean", length(col("text_clean")).cast("long"))

  private val htmlStripSql =
    s"""WITH raw AS (
       |  SELECT doc_id, $htmlColSql AS html
       |  FROM documents),
       |s1 AS (SELECT doc_id, html,
       |  ${stripHtmlSqlExpr("html")} AS text_clean
       |  FROM raw)
       |SELECT doc_id, CAST(length(html) AS BIGINT) AS n_raw, text_clean,
       |  CAST(length(text_clean) AS BIGINT) AS n_clean
       |FROM s1""".stripMargin

  // ----------------------------------------------------------------- url

  /** Deterministic messy URL per document: uppercase scheme/host noise,
    * `www.`, an explicit default port, tracking params interleaved with
    * a payload param, and a fragment. The modulus on the id param makes
    * distinct documents collapse to the same canonical URL (the
    * re-crawl/alias population url_dedup exists for).
    */
  private def urlCol: Column =
    concat(lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/docs/"),
      (col("doc_id") % 10).cast("string"),
      lit("?utm_source=feed&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
      lit("&id="), (col("doc_id") % 30).cast("string"),
      lit("&ref=rss#sec"), (col("doc_id") % 7).cast("string"))

  // single-line: see htmlColSql note
  private val urlColSql =
    """'HTTPS://WWW.' || source || '.Example.COM:443/docs/' || CAST(doc_id % 10 AS VARCHAR) || '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR) || '&id=' || CAST(doc_id % 30 AS VARCHAR) || '&ref=rss#sec' || CAST(doc_id % 7 AS VARCHAR)"""

  private val schemeHostPat = "^[A-Za-z]+://[^/?#]*"

  // the canonicalization chains as single DuckDB SQL expressions —
  // shared by url_canonicalize and crawl_pipeline so the spellings can
  // never diverge (single-line per the stripMargin note above)
  private def canonHostSqlExpr(sh: String): String =
    s"""replace(regexp_replace(regexp_replace(lower($sh), '^(https://[^:/]*):443\\z', '\\1', 'g'), '^(http://[^:/]*):80\\z', '\\1', 'g'), '://www.', '://')"""

  private def canonRestSqlExpr(u1: String, sh: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(substr($u1, length($sh) + 1, 100000), '([?&])(utm_[a-z0-9]+|ref)=[^&]*', '\\1', 'g'), '&{2,}', '&', 'g'), '\\?&', '?', 'g'), '[?&]+\\z', '', 'g')"""

  /** RFC-3986-style normalization: drop the fragment, lowercase the
    * scheme+authority (ONLY that prefix — path/query case is
    * significant), strip the scheme-default port and the `www.` alias,
    * drop tracking params (`utm_*`, `ref`), then repair the separator
    * debris (`&&`, `?&`, trailing `?`/`&`). Canonical key for
    * crawl-frontier dedup, sitemap joins, and robots lookups.
    */
  /** The reusable kernel: apply to ANY string column carrying a URL. */
  def canonicalizeUrl(url: Column): Column = {
    // dialect-divergence-free anchors: java's $ matches BEFORE a final
    // newline, RE2's does not — [\s\S]* (to end-of-text) and \z
    // (exact end) mean the same thing in BOTH regex engines, so a URL
    // with a trailing newline can never split the engines
    val u1 = regexp_replace(url, "#[\\s\\S]*", "")
    val sh = regexp_extract(u1, schemeHostPat, 0)
    val rest = u1.substr(length(sh) + 1, lit(100000))
    // port strip is SCHEME-AWARE: only the scheme's own default port is
    // redundant (https:443 / http:80) — http://a:443 is a real origin
    // and must keep its port. Backreference syntax differs by engine
    // ($1 java.regex here, \1 RE2 in the oracle) — the parity gate pins
    // the semantics, not the spelling.
    val host = replace(
      regexp_replace(regexp_replace(lower(sh),
        "^(https://[^:/]*):443\\z", "$1"), "^(http://[^:/]*):80\\z", "$1"),
      lit("://www."), lit("://"))
    // tracking params are matched WITH their [?&] separator (kept via
    // the backref) so 'href=', 'prefix=' or a path '/ref=x' can never
    // be eaten — the repair passes then collapse the '?&'/'&&' debris
    val rest2 = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(rest, "([?&])(utm_[a-z0-9]+|ref)=[^&]*", "$1"),
      "&{2,}", "&"), "\\?&", "?"), "[?&]+\\z", "")
    concat(host, rest2)
  }

  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), urlCol.as("url"),
        canonicalizeUrl(urlCol).as("canonical_url"))

  private val urlCanonicalizeSql =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    $urlColSql AS url
       |  FROM documents),
       |s1 AS (SELECT doc_id, url, regexp_replace(url, '#[\\s\\S]*', '', 'g') AS u1 FROM raw),
       |s2 AS (SELECT *, regexp_extract(u1, '$schemeHostPat') AS sh FROM s1),
       |s3 AS (SELECT doc_id, url,
       |    ${canonHostSqlExpr("sh")} AS host,
       |    ${canonRestSqlExpr("u1", "sh")} AS rest2
       |  FROM s2)
       |SELECT doc_id, url, host || rest2 AS canonical_url FROM s3""".stripMargin

  /** Crawl dedup on the canonical key: one keep-min aggregation —
    * min doc_id survives as the group representative, the rest count
    * as aliases. Emits only keys that actually collapsed (n_dups > 0);
    * the survivor set is the anti-join complement, same exchange.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame =
    urlCanonicalize(spark, dir)
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        (count(lit(1)) - 1).as("n_dups"))
      .where(col("n_dups") > 0)

  private val urlDedupSql =
    s"""WITH canon AS ($urlCanonicalizeSql)
       |SELECT canonical_url, min(doc_id) AS keep_doc_id,
       |  count(*) - 1 AS n_dups
       |FROM canon GROUP BY 1 HAVING count(*) - 1 > 0""".stripMargin

  // --------------------------------------------------- perplexity buckets

  /** CCNet-style head/middle/tail split: every document ranked by LM
    * perplexity ([[TextAnalysis.lmPerplexity]] — the bigram model both
    * engines compute identically) and cut into exact terciles. Head =
    * lowest perplexity (most fluent) — the bucket CCNet keeps.
    *
    * Scale shape: the tercile is NOT a global ntile window (that would
    * single-partition the corpus) — it's the [[RangeRank]] exact
    * distributed rank (sampled range buckets + broadcast offsets +
    * partitioned windows) through the closed-form ntile formula,
    * hash-identical to the oracle's `ntile(3)`: the rfm_segments
    * discipline applied to the curation pipeline.
    */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    // RangeRank's cutoff sampling is an EAGER action over its input —
    // run straight on lmPerplexity, the whole bigram-LM pipeline would
    // execute twice (once to sample, once for the real job). The
    // checkpoint materializes the scored relation ONCE and both reads
    // come from it — exactly how a production run stages an expensive
    // scoring pass before quantile cuts (the h3_compact precedent).
    val base = TextAnalysis.lmPerplexity(spark, dir)
      .select(col("doc_id"), col("ppl"))
      // rank DESC on the negated key == ppl ASC: head ranks first
      .withColumn("negppl", -col("ppl"))
      .localCheckpoint()
    RangeRank.withRankDesc(base, "negppl", "doc_id", "__rk",
        totalOut = Some("__n"))
      .withColumn("bucket",
        RangeRank.ntileFromRank(col("__rk"), col("__n"), 3))
      .select(col("doc_id"), col("ppl"), col("bucket"),
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle")
          .otherwise("tail").as("bucket_name"))
  }

  private val perplexityBucketsSql =
    s"""WITH base AS (${TextAnalysis.lmPerplexitySql})
       |SELECT doc_id, ppl, bucket,
       |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       |    ELSE 'tail' END AS bucket_name
       |FROM (
       |  SELECT doc_id, ppl,
       |    ntile(3) OVER (ORDER BY ppl ASC, doc_id ASC) AS bucket
       |  FROM base)""".stripMargin

  // ------------------------------------------------------ composed flow

  /** The crawl front end COMPOSED, one lazy plan (the curation_pipeline
    * discipline applied to this family): strip the HTML, keep exactly
    * one document per canonical URL (min doc_id — the url_dedup
    * survivor set, spelled as a canonical-key-partitioned rank so it
    * stays one exchange), gate on extracted-text length, and roll the
    * survivors up per source. The oracle is the same CTE chain — the
    * stages compose without drift or hidden materialization.
    *
    * Scale shape: two exchanges total — the canonical-key window and
    * the per-source aggregation. Everything else is row-local string
    * work fused into the scan.
    */
  def crawlPipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_url")).orderBy(col("doc_id").asc)
    Tables.documents(spark, dir)
      // only the LENGTH of the stripped text rides the shuffle — the
      // length is row-deterministic, so computing it before the
      // canonical-url exchange (instead of carrying the whole cleaned
      // body for rows the window immediately discards) is
      // result-identical and shrinks the shuffle payload from the
      // corpus text to 8 bytes/row
      .select(col("doc_id"), col("source"),
        length(stripHtml(htmlCol)).cast("long").as("n_clean"),
        canonicalizeUrl(urlCol).as("canonical_url"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1 && col("n_clean") >= 120)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_clean")).as("n_chars"),
        min(col("doc_id")).as("first_doc"))
  }

  private val crawlPipelineSql =
    s"""WITH raw AS (
       |  SELECT doc_id, source, $htmlColSql AS html, $urlColSql AS url
       |  FROM documents),
       |stripped AS (
       |  SELECT doc_id, source,
       |  CAST(length(${stripHtmlSqlExpr("html")}) AS BIGINT) AS n_clean,
       |  url FROM raw),
       |s1 AS (SELECT *, regexp_replace(url, '#[\\s\\S]*', '', 'g') AS u1 FROM stripped),
       |s2 AS (SELECT *, regexp_extract(u1, '$schemeHostPat') AS sh FROM s1),
       |canon AS (SELECT doc_id, source, n_clean,
       |    ${canonHostSqlExpr("sh")}
       |    || ${canonRestSqlExpr("u1", "sh")} AS canonical_url
       |  FROM s2),
       |survivors AS (
       |  SELECT doc_id, source, n_clean FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical_url
       |      ORDER BY doc_id ASC) AS rk
       |    FROM canon)
       |  WHERE rk = 1 AND n_clean >= 120)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_clean) AS BIGINT) AS n_chars, min(doc_id) AS first_doc
       |FROM survivors GROUP BY 1""".stripMargin

  // -------------------------------------------------- boilerplate lines

  /** Deterministic multi-line page per document: a nav header and
    * copyright footer SHARED by every page of the source (df = 100% —
    * the boilerplate population), a promo line rotating over 4 variants
    * (df ≈ 25% — below threshold, must survive), and the document text
    * (unique). The htmlCol discipline: both engines build byte-identical
    * pages from the same parquet.
    */
  private def pageCol: Column =
    concat(lit("NAV "), col("source"), lit(" | home | login\n"),
      col("text"), lit("\nPromo of the week no "),
      expr("(doc_id div 20) % 4").cast("string"),
      lit("\nCopyright "), col("source"))

  private val pageColSql =
    """'NAV ' || source || ' | home | login' || chr(10) || text || chr(10) || 'Promo of the week no ' || CAST((doc_id // 20) % 4 AS VARCHAR) || chr(10) || 'Copyright ' || source"""

  /** RefinedWeb-style per-domain boilerplate removal: a line appearing
    * in more than 30% of a source's documents (nav bars, footers,
    * cookie banners) is template, not content — strip it everywhere and
    * reassemble the documents. The rule most crawl pipelines run
    * between HTML extraction and the dedup family (line-level EXACT
    * corpus dedup is `passage_dedup`'s job; this is the per-domain
    * frequency gate).
    *
    * Scale shape: one (source, line-hash) exchange computes document
    * frequencies (the join and group key is the 8-byte xxhash64 of the
    * line — join-key-only, so oracle parity is unaffected, the dedup
    * family's discipline); the per-source doc counts broadcast; the
    * per-document reassembly is the second exchange. Line order is
    * restored by an in-row sort of (pos, line) structs before the
    * join — the `listagg_names` discipline, reproducible under any
    * partitioning.
    */
  def boilerplateLines(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(split(pageCol, "\n")).as(Seq("pos", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val srcn = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val df = lines.groupBy(col("source"), col("lh"))
      .agg(countDistinct(col("doc_id")).as("df"))
    // df is the per-source line vocabulary — sub-linear but corpus-
    // derived, so pin the shuffle join (only srcn broadcasts)
    val marked = lines
      .join(df.hint("shuffle_hash"), Seq("source", "lh"))
      .join(broadcast(srcn), Seq("source"))
      .withColumn("boiler",
        col("df").cast("double") / col("n_docs") > 0.3)
    // NULL means "no lines survived" — NOT "survivors joined to the
    // empty string" (a kept empty line must yield '', matching
    // DuckDB's FILTERed string_agg; review r14). Distinguish by the
    // survivor COUNT, not by the joined value.
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("boiler"), 1)).as("n_boiler"),
        array_join(transform(
          array_sort(collect_list(when(!col("boiler"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("joined"))
      .select(col("doc_id"), col("n_lines"), col("n_boiler"),
        when(col("n_lines") === col("n_boiler"), lit(null))
          .otherwise(col("joined")).as("clean_text"))
  }

  private val boilerplateLinesSql =
    s"""WITH pages AS (
       |  SELECT doc_id, source, $pageColSql AS page
       |  FROM documents),
       |lines AS (
       |  SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
       |    (string_split(page, chr(10)))[i + 1] AS line
       |  FROM pages, UNNEST(range(0, len(string_split(page, chr(10))))) AS t(i)),
       |srcn AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |df AS (
       |  SELECT source, line, count(DISTINCT doc_id) AS df
       |  FROM lines GROUP BY 1, 2),
       |marked AS (
       |  SELECT l.doc_id, l.pos, l.line,
       |    CAST(d.df AS DOUBLE) / s.n_docs > 0.3 AS boiler
       |  FROM lines l
       |  JOIN df d ON l.source = d.source AND l.line = d.line
       |  JOIN srcn s ON l.source = s.source)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(count(*) FILTER (boiler) AS BIGINT) AS n_boiler,
       |  string_agg(line, chr(10) ORDER BY pos) FILTER (NOT boiler)
       |    AS clean_text
       |FROM marked GROUP BY 1""".stripMargin

  /** kernel name → (Column kernel, equivalent DuckDB SQL expression
    * over a column literally named `s`) — the contract surface for
    * `tools/fuzz_kernels.py`, which replays an ADVERSARIAL corpus
    * through both engines. The fixture-shaped oracles above can only
    * prove parity on fixture-shaped input; the in-JVM fuzz spec
    * (WebKernelFuzzSpec) shares java.regex with the engine, so ONLY
    * this cross-engine path can catch an RE2-vs-java.regex semantic
    * divergence on hostile strings.
    */
  val kernelOracles: Map[String, (Column => Column, String)] = {
    val u1 = "regexp_replace(s, '#[\\s\\S]*', '', 'g')"
    val sh = s"regexp_extract($u1, '$schemeHostPat')"
    Map(
      "strip_html" -> ((stripHtml _, stripHtmlSqlExpr("s"))),
      "canonicalize_url" ->
        ((canonicalizeUrl _,
          s"${canonHostSqlExpr(sh)} || ${canonRestSqlExpr(u1, sh)}")))
  }

  val ops: Seq[Op] = Seq(
    Op("html_strip", htmlStrip, Some(htmlStripSql)),
    Op("url_canonicalize", urlCanonicalize, Some(urlCanonicalizeSql)),
    Op("url_dedup", urlDedup, Some(urlDedupSql)),
    Op("perplexity_buckets", perplexityBuckets, Some(perplexityBucketsSql)),
    Op("crawl_pipeline", crawlPipeline, Some(crawlPipelineSql)),
    Op("boilerplate_lines", boilerplateLines, Some(boilerplateLinesSql)),
  )
}
