package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}

/** Market-basket and recommendation primitives over the order history —
  * association rules, item-item collaborative filtering, rank fusion,
  * and the Pareto-optimal (skyline) frontier.
  *
  * Scale shapes: both co-occurrence ops BLOCK on the grouping entity
  * (order / customer) — never all-pairs over items — via ONE
  * collect_set shuffle + in-group pair explode (the interaction_pairs
  * discipline); a PCY candidate pass can prune the pair exchange for
  * network-bound deployments (opt-in — see pairCounts and BENCH.md's
  * r8 A/B). Fan-out is bounded by basket
  * size (≤ C(13,2)
  * pairs per order here, physically bounded by order volume
  * everywhere); per-user histories are quadratic, so users above the
  * history cap are cut BEFORE pairing — a free size() filter on the
  * collected set, the DIMSUM/production-CF hardening that keeps one
  * hot user from emitting 10⁸ pairs.
  * The item-count enrichments are item-cardinality relations — no
  * static broadcast hint on them (VERDICT r3's homes lesson: item/device
  * cardinality explodes at 100 TB), so AQE picks by MEASURED size:
  * broadcast at test SF, shuffle once the catalog outgrows the
  * threshold.
  */
object Recommend {

  /** Exact thresholded pair counts over per-entity item sets: the
    * in-group explode emits each a<b pair once (`pair_structs`, one
    * codegen'd kernel), shuffled on (ia, ib) into the exact count.
    *
    * `usePcy = true` adds the PCY candidate pass
    * (functions/PcyExpressions.scala) pruning the pair exchange: a
    * map-side bucket sketch (one row, 2^bits saturating byte counters)
    * upper-bounds every pair's count, and only pairs whose bucket
    * reaches `minCount` are shuffled into the exact groupBy — the
    * survivors' counts are exact, and no qualifying pair can be
    * dropped (collisions only over-count). The sketch is collected
    * once and probed through a constant-reference codegen'd predicate
    * (NOT passed as a column: UnsafeRow.getBinary would re-copy the
    * whole array per probed row — measured as a multi-minute stall).
    * At sf0.1 this cuts the CF pair shuffle from ~10.4M rows to ~400k.
    *
    * DEFAULT IS DIRECT (r8 A/B + structural analysis, BENCH.md): PCY
    * lost at every local scale and sizing tried, and the loss is
    * structural, not environmental. To prune at pair volume P the
    * sketch needs ~P/1.5 buckets; the buckets are a PER-TASK partial
    * buffer, so the sketch's own merge traffic is tasks × 2^bits ≈
    * tasks × P/1.5 bytes — more than the 16-byte/pair shuffle it
    * replaces whenever tasks > ~24. Undersized, it saturates
    * (λ ≫ 1 ⇒ nothing pruned, measured at 10×: the r7-sized 2²³
    * sketch passed 100% of 104M pairs); sized up, the partial
    * allocation alone (cores × 2^bits) OOMs before the traffic wall.
    * PCY is a single-shared-hash-table trick: the opt-in
    * (explicit `usePcy` param ONLY — r8 advice: an environment-read
    * default let an inherited variable silently flip the contracted
    * plan shape under tests and bench) serves the single-node/
    * moderate-volume regime where that table exists — which a test
    * fixture is and a 1000-executor shuffle is not.
    */
  /** Packability chooser for [[pairCounts]]' 8-byte packed pair keys:
    * true iff every l_partkey fits an unsigned 32-bit value, proven by
    * MIN/MAX over the one key column (r11, guide §2.3 — narrower types
    * only when provably safe). The bound comes from parquet FOOTER
    * statistics read driver-side — metadata cost, no Spark job — for
    * tables of up to 64 files; a wider table (the 100 TB layout) pays
    * one distributed narrow-column MIN/MAX job instead (~2% of a query
    * whose pair volume is ~17× the row count; a driver-side loop over
    * thousands of footers would be the §5 single-threaded-driver
    * trap). Any anomaly — missing stats, a null page, an unreadable
    * footer — falls back to the distributed proof, and the packed
    * kernel itself still validates every element, so a wrong chooser
    * answer can fail loudly but never corrupt a pair. Item ids outgrow
    * u32 only past SF ≈ 21 000 (TPC-H partkey = 200 000·SF); past that
    * the chooser routes to the unpacked struct spelling.
    */
  private[graft] def itemIdsPackU32(spark: SparkSession, dir: String): Boolean =
    footerLongBounds(spark, s"$dir/lineitem.parquet", "l_partkey") match {
      case Some((mn, mx)) => mn >= 0L && mx <= 0xFFFFFFFFL
      case None =>
        val r = Tables.lineitem(spark, dir)
          .agg(min(col("l_partkey")), max(col("l_partkey"))).head()
        !r.isNullAt(0) && r.getLong(0) >= 0L && r.getLong(1) <= 0xFFFFFFFFL
    }

  /** (min, max) of a BIGINT column from parquet footer statistics,
    * driver-side; None when the table is too wide for a driver loop
    * (> 64 files) or any row group lacks trustworthy stats — callers
    * then prove the bound with a distributed aggregation instead.
    */
  private def footerLongBounds(spark: SparkSession, path: String,
      column: String): Option[(Long, Long)] = try {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet"))
      else Array(st)
    if (files.isEmpty || files.length > 64) return None
    import scala.jdk.CollectionConverters._
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var seen = false
    var trusted = true
    files.foreach { f =>
      if (trusted) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(f.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          for (b <- reader.getFooter.getBlocks.asScala if trusted;
               c <- b.getColumns.asScala
               if trusted && c.getPath.toDotString == column) {
            val s = c.getStatistics
            if (s == null || s.isEmpty) trusted = false
            else if (s.hasNonNullValue) {
              (s.genericGetMin, s.genericGetMax) match {
                case (lo: java.lang.Long, hi: java.lang.Long) =>
                  mn = math.min(mn, lo.longValue)
                  mx = math.max(mx, hi.longValue)
                  seen = true
                case _ => trusted = false
              }
            }
          }
        } finally reader.close()
      }
    }
    if (trusted && seen) Some((mn, mx)) else None
  } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def pairCounts(
      sets0: DataFrame, minCount: Int, bits: Int = 23,
      usePcy: Boolean = false, packU32: Boolean = false)
      : DataFrame = {
    require(minCount >= 1 && minCount <= Byte.MaxValue,
      s"pairCounts: minCount must fit the sketch's byte counters, got $minCount")
    // PCY can pay only when the threshold prunes: a count-1 pair
    // survives a t=2 prune whenever its bucket takes ONE more hit
    // (1-e^-λ — no real selectivity at any sizing); t≥3 is where the
    // tail P(Poisson(λ) ≥ t-1) collapses, so t<3 is always direct.
    if (packU32 && !usePcy) {
      // r11 (guide §2.3, VERDICT r10 #1): when the caller's chooser
      // proves every item id < 2^32, the pair rides ONE packed long —
      // (min << 32) | max — through Generate, the exchange and the
      // count aggregate: 24 → 16 UnsafeRow bytes per pair row and a
      // single-long aggregation key instead of a two-field row. The
      // match-bounded survivors unpack after the threshold.
      return sets0
        .select(explode(call_function("pair_longs", col("items"))).as("pk"))
        .repartition(col("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("co"))
        .where(col("co") >= minCount)
        .select(shiftrightunsigned(col("pk"), 32).as("ia"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("ib"), col("co"))
    }
    if (minCount < 3 || !usePcy) {
      // NOT a groupBy-planned exchange: the explicit raw repartition
      // beats map-side partial agg here (r8 A/B "direct-v2") — pairs
      // are near-unique within a task, so the partial hash build
      // reduces little and costs ~30% at 10× scale.
      val pairs = sets0
        .select(explode(call_function("pair_structs", col("items"))).as("p"))
        .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
      return pairs
        .repartition(col("ia"), col("ib"))
        .groupBy(col("ia"), col("ib"))
        .agg(count(lit(1)).as("co"))
        .where(col("co") >= minCount)
    }
    // The sketch is a SCALAR SUBQUERY, so the whole prune is one
    // declarative query: the subquery runs once per execution (its
    // 2^bits-byte result — 8 MB at the default — enters the probe as a
    // plan literal, the bounded-collect discipline of the k-means
    // centroids), and physical planning's exchange reuse lets the
    // subquery and the main pair explode share the sets exchange. No
    // checkpoint, no extra action, still fully lazy.
    // The pair hash is PROJECTED below the sketch aggregate, not
    // nested inside it: a TypedImperativeAggregate evaluates its child
    // interpreted per input row, so xxhash64 must run in the codegen'd
    // projection underneath — the aggregate's update then only reads a
    // long field (measured ~1 s/10M rows difference at sf0.1).
    // pair_structs emits exactly n(n-1)/2 canonical pairs per set in
    // one codegen'd kernel — the double-explode idiom it replaces
    // flowed n² rows and filtered half (measured ~2x the generate
    // volume on the CF pipeline).
    // The explode stage's INPUT is small (one row per entity) but its
    // CPU is pair-volume (n(n-1)/2 per set): AQE coalesces the sets
    // exchange by BYTES, so the heaviest stage of the query ran on
    // 3-5 of 32 cores (r7 profile: 0.5 s stages at task count 3). The
    // round-robin respread is an exchange of the SMALL relation that
    // buys full parallelism for the big CPU; both the sketch subquery
    // and the main probe hang off the one respread exchange
    // (ReusedExchange).
    val spread = sets0.repartition(
      sets0.sparkSession.sparkContext.defaultParallelism)
    def pairs = spread
      .select(explode(call_function("pair_structs", col("items"))).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"),
        xxhash64(col("p.ia"), col("p.ib")).as("pk"))
    val sketch = pairs
      .select(call_function("pcy_sketch", col("pk"), lit(bits)).as("sk")).scalar()
    pairs.where(call_function("pcy_prune", col("pk"), sketch, lit(minCount)))
      .drop("pk")
      // survivors are few and near-unique: shuffle raw, aggregate once
      // post-shuffle (a pre-shuffle partial agg reduces nothing here)
      .repartition(col("ia"), col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= minCount)
  }

  /** Per-order distinct item sets: ONE shuffle on the grouping entity
    * (collect_set dedups during partial aggregation), from which the
    * item counts, the order count, and the in-group pair explode all
    * hang — every consumer reads the same exchange (ReusedExchange),
    * and pairs expand MAP-side with partial aggregation before the
    * (a, b) shuffle. The self-join formulation this replaces shuffled
    * the basket relation twice and materialized every pair row through
    * a join (measured 1.21 s → this shape 3-4× less exchange volume).
    */
  private def basketSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy(col("okey"))
      // min_k_distinct = collect_set with an O(cap) buffer: a real
      // basket is physically small (≤13 items here), so the 1024 cap
      // is unreachable on sane data — it exists so a degenerate
      // "basket" (bot/aggregator order with 10⁵ distinct items) can
      // neither build an unbounded aggregation buffer nor explode n²
      // pairs; such orders are dropped whole (they are not baskets)
      .agg(call_function("min_k_distinct", col("item"), lit(1025))
        .as("items"))
      .where(size(col("items")) <= 1024)

  /** Association rules a→b over order baskets: support, confidence,
    * lift for every ordered pair co-purchased in ≥ 2 orders (both rule
    * directions emitted — confidence is asymmetric). Integer counts
    * throughout; one double division per measure, rounded 1e-9.
    */
  def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    val sets = basketSets(spark, dir)
    val itemCnt = sets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val nOrders = sets.agg(count(lit(1)).as("n"))
    // Generate each unordered pair ONCE (a<b), mirror after the count:
    // co-occurrence is symmetric, so this halves both the generated
    // rows and the pair shuffle, and the mirror runs over the tiny
    // thresholded result. minCount=2 always takes pairCounts' direct
    // path — a t=2 prune has no selectivity (see pairCounts).
    val half = Recommend.pairCounts(sets, minCount = 2,
        packU32 = itemIdsPackU32(spark, dir))
      .withColumnRenamed("co", "pair_cnt")
    val co = half.select(col("ia").as("ante"), col("ib").as("cons"),
        col("pair_cnt"))
      .unionByName(half.select(col("ib").as("ante"), col("ia").as("cons"),
        col("pair_cnt")))
    co.join(itemCnt.withColumnRenamed("item", "ante")
          .withColumnRenamed("cnt", "cnt_a"), Seq("ante"))
      .join(itemCnt.withColumnRenamed("item", "cons")
          .withColumnRenamed("cnt", "cnt_b"), Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        round(col("pair_cnt").cast("double") / col("n"), 9).as("support"),
        round(col("pair_cnt").cast("double") / col("cnt_a"), 9)
          .as("confidence"),
        round(col("pair_cnt").cast("double") * col("n")
          / (col("cnt_a") * col("cnt_b")), 9).as("lift"))
  }

  private val marketBasketSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
      |           FROM lineitem),
      |ic AS (SELECT item, count(*) AS cnt FROM b GROUP BY 1),
      |n AS (SELECT count(DISTINCT okey) AS n FROM b),
      |co AS (
      |  SELECT a.item AS ante, bb.item AS cons, count(*) AS pair_cnt
      |  FROM b a JOIN b bb ON a.okey = bb.okey AND a.item <> bb.item
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT ante, cons, pair_cnt, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
      |  round(CAST(pair_cnt AS DOUBLE) / n.n, 9) AS support,
      |  round(CAST(pair_cnt AS DOUBLE) / ca.cnt, 9) AS confidence,
      |  round(CAST(pair_cnt AS DOUBLE) * n.n / (ca.cnt * cb.cnt), 9) AS lift
      |FROM co
      |JOIN ic ca ON ca.item = co.ante
      |JOIN ic cb ON cb.item = co.cons
      |CROSS JOIN n""".stripMargin

  /** Item-item cosine similarity over binary customer-item histories
    * (who-bought-X-also-bought-Y), top-5 neighbors per item by rounded
    * cosine (ties by neighbor id — fully deterministic). Users above
    * the 60-item history cap are cut BEFORE pairing (and the per-item
    * counts are taken over the SAME capped relation, so the cosine is
    * internally consistent); pairs below 4 co-occurrences are noise and
    * dropped. cos = co/√(n_a·n_b) — integers into one division + sqrt,
    * rounded 1e-9, RANKED ON THE ROUNDED VALUE so both engines break
    * ties identically.
    */
  def itemItemCosine(spark: SparkSession, dir: String): DataFrame =
    itemItemCosine(spark, dir, usePcy = false)

  /** `usePcy` opts into the PCY sketch pass for network-bound
    * deployments (see BENCH.md's PCY A/B table for the measured
    * trade; default direct). Opt-in is by THIS parameter only —
    * never an environment variable — so the registered query's
    * contracted plan shape cannot flip under an inherited env.
    */
  def itemItemCosine(spark: SparkSession, dir: String,
      usePcy: Boolean): DataFrame = {
    // One shuffle on u; min_k_distinct dedups (u, i) during partial
    // agg IN an O(61) buffer — the 61st smallest item only proves the
    // history exceeds 60, so the size() gate below is the same
    // keep/drop decision as collect_set + filter, but a bot "user"
    // with 10⁶ distinct items can't build an unbounded buffer first.
    // Pairs explode in-group — same single-exchange discipline as
    // basketSets above (the join formulation measured 2.55 s; this
    // deletes two of its three pre-pair exchanges).
    val sets = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .groupBy(col("u"))
      .agg(call_function("min_k_distinct", col("i"), lit(61)).as("items"))
      .where(size(col("items")) <= 60)
    val itemCnt = sets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val co = Recommend.pairCounts(sets, minCount = 4, usePcy = usePcy,
        packU32 = !usePcy && itemIdsPackU32(spark, dir))
      .select(col("ia").as("item_a"), col("ib").as("item_b"), col("co"))
    val scored = co
      .join(itemCnt.withColumnRenamed("i", "item_a")
          .withColumnRenamed("cnt", "cnt_a"), Seq("item_a"))
      .join(itemCnt.withColumnRenamed("i", "item_b")
          .withColumnRenamed("cnt", "cnt_b"), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co"),
        round(col("co").cast("double")
          / sqrt((col("cnt_a") * col("cnt_b")).cast("double")), 9)
          .as("cosine"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("item_a"))
          .orderBy(col("cosine").desc, col("item_b").asc)))
      .where(col("rk") <= 5)
      .select(col("item_a"), col("item_b"), col("co"), col("cosine"),
        col("rk").cast("long").as("rk"))
  }

  private val itemItemCosineSql =
    """WITH ui AS (
      |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |kept AS (SELECT u FROM ui GROUP BY u HAVING count(*) <= 60),
      |cui AS (SELECT ui.u, ui.i FROM ui JOIN kept ON ui.u = kept.u),
      |ic AS (SELECT i, count(*) AS cnt FROM cui GROUP BY 1),
      |co AS (
      |  SELECT a.i AS item_a, b.i AS item_b, count(*) AS co
      |  FROM cui a JOIN cui b ON a.u = b.u AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 4),
      |scored AS (
      |  SELECT item_a, item_b, co,
      |    round(CAST(co AS DOUBLE)
      |      / sqrt(CAST(ca.cnt * cb.cnt AS DOUBLE)), 9) AS cosine
      |  FROM co
      |  JOIN ic ca ON ca.i = co.item_a
      |  JOIN ic cb ON cb.i = co.item_b)
      |SELECT item_a, item_b, co, cosine, rk FROM (
      |  SELECT item_a, item_b, co, cosine,
      |    CAST(row_number() OVER (PARTITION BY item_a
      |      ORDER BY cosine DESC, item_b ASC) AS BIGINT) AS rk
      |  FROM scored)
      |WHERE rk <= 5""".stripMargin

  /** Reciprocal-rank fusion of two retrieval rankings (k = 60, the
    * published default): documents ranked by term frequency of "spark"
    * and of "table", fused as Σ 1/(60+rank), top 20. The fusion is the
    * op — at production scale its inputs arrive as bounded top-k lists
    * per query (ANN / BM25 outputs); here they derive inline from the
    * corpus, so each ranking covers the full docs relation. Term
    * frequencies are overwhelmingly tied at 0, which defeats the
    * single-key [[RangeRank]] (ties must share a bucket → the hot
    * bucket IS the corpus); [[RangeRank.withRankMajorDesc]] cuts the
    * tie mass on the UNIQUE doc_id instead — bucket = (tf, doc_id
    * range bucket), offsets over the bounded |tf|×buckets relation —
    * so the corpus never single-partitions (r6 verdict #2). Both
    * passes share one eagerly sampled doc_id cut set taken from the
    * slim base projection (the rfm lesson: never sample the previous
    * pass's output). The final top-20 is a TakeOrderedAndProject with
    * the rank assigned over the 20 surviving rows — never a third
    * global window. Ranks are integers; two double divisions + one
    * add in a fixed sequence, rounded 1e-9, and the final top-20
    * ranks on the ROUNDED score (ties by doc_id).
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    def tf(term: String) =
      size(filter(split(col("text"), " "), x => x === term)).cast("long")
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tf("spark").as("tf1"), tf("table").as("tf2"))
    val cuts = RangeRank.sampleCuts(
      Tables.documents(spark, dir).select(col("doc_id")), Seq("doc_id"))("doc_id")
    val r1 = RangeRank.withRankMajorDesc(base, "tf1", "doc_id", "r1",
      cuts = Some(cuts))
    val ranked = RangeRank.withRankMajorDesc(r1, "tf2", "doc_id", "r2",
      cuts = Some(cuts))
    ranked
      .select(col("doc_id"), col("r1"), col("r2"),
        round(lit(1).cast("double") / (col("r1") + 60)
          + lit(1).cast("double") / (col("r2") + 60), 9).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
  }

  private val rrfFusionSql =
    """WITH tf AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark'))
      |      AS BIGINT) AS tf1,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'table'))
      |      AS BIGINT) AS tf2
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY tf1 DESC, doc_id ASC) AS BIGINT)
      |      AS r1,
      |    CAST(row_number() OVER (ORDER BY tf2 DESC, doc_id ASC) AS BIGINT)
      |      AS r2
      |  FROM tf),
      |fused AS (
      |  SELECT doc_id, r1, r2,
      |    round(CAST(1 AS DOUBLE) / (r1 + 60)
      |      + CAST(1 AS DOUBLE) / (r2 + 60), 9) AS rrf
      |  FROM ranked)
      |SELECT doc_id, r1, r2, rrf, rk FROM (
      |  SELECT doc_id, r1, r2, rrf,
      |    CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
      |      AS rk
      |  FROM fused)
      |WHERE rk <= 20""".stripMargin

  /** 2-D skyline (Pareto frontier) of customers maximizing (account
    * balance, lifetime spend): every customer not dominated by another
    * with ≥ on both axes and > on at least one. Computed by the
    * O(n log n) sweep, relationally: collapse to per-x maxima first
    * (same-x dominance resolves inside the group), then a point
    * survives iff its y beats the running max over STRICTLY greater x.
    * x = acctbal is near-unique, so the x-distinct relation is
    * CUSTOMER-cardinality — the sweep is therefore the distributed
    * [[RangeRank.withRunningMaxDescExclusive]] (per-x-range-bucket
    * windows merged on the bounded per-bucket maxes), never a global
    * single-partition window (r7 audit — the prior spelling's
    * "value-domain-sized" claim didn't hold for a continuous axis).
    * Spend rides an exact DECIMAL(18,2)
    * sum, so the join-back on (x, ymax) and the dominance compares are
    * all exact; no-order customers count as 0 spend.
    */
  def skylineFrontier(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sp"))
    val pts = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_acctbal").as("x"),
        coalesce(col("sp"), lit(0).cast(DecimalType(18, 2))).as("y"))
    val gx = pts.groupBy(col("x")).agg(max(col("y")).as("ymax"))
    // x = acctbal is near-UNIQUE, so the x-distinct relation is
    // customer-cardinality — a global running-max window here would
    // single-partition it (the shape the doc above used to hand-wave
    // as "value-domain-sized"; r7 audit). The RangeRank exclusive
    // running max runs the same sweep per sampled x-range bucket and
    // merges on the bounded per-bucket maxes — exactly the
    // "1000-executor version" the doc describes, now the only version.
    val skyX = RangeRank.withRunningMaxDescExclusive(gx, "x",
        col("ymax"), "msp")
      .where(col("msp").isNull || col("ymax") > col("msp"))
      .select(col("x"), col("ymax"))
    pts.join(skyX, pts("x") === skyX("x") && pts("y") === skyX("ymax"),
        "left_semi")
      .select(col("c_custkey"), col("x").as("acctbal"),
        col("y").cast("double").as("total_spend"))
  }

  private val skylineFrontierSql =
    """WITH spend AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
      |  FROM orders GROUP BY 1),
      |pts AS (
      |  SELECT c_custkey, c_acctbal AS x,
      |    coalesce(sp, CAST(0 AS DECIMAL(18,2))) AS y
      |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
      |gx AS (SELECT x, max(y) AS ymax FROM pts GROUP BY 1),
      |sky AS (
      |  SELECT x, ymax FROM (
      |    SELECT x, ymax, MAX(ymax) OVER (ORDER BY x DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS msp
      |    FROM gx)
      |  WHERE msp IS NULL OR ymax > msp)
      |SELECT c_custkey, x AS acctbal, CAST(y AS DOUBLE) AS total_spend
      |FROM pts WHERE EXISTS (
      |  SELECT 1 FROM sky WHERE sky.x = pts.x AND sky.ymax = pts.y)""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("market_basket", marketBasket, Some(marketBasketSql), bench = true),
    Op("item_item_cosine", itemItemCosine, Some(itemItemCosineSql), bench = true),
    Op("rrf_fusion", rrfFusion, Some(rrfFusionSql)),
    Op("skyline_frontier", skylineFrontier, Some(skylineFrontierSql)),
  )
}
