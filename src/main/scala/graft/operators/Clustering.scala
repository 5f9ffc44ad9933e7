package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Op

/** Duplicate-cluster resolution: candidate PAIRS (from MinHash-LSH)
  * → connected components → one cluster id per document. This is the
  * step that turns near-dup detection into an actionable keep/drop
  * list for a training corpus — pairs alone over-count (A~B, B~C must
  * collapse to one cluster {A,B,C}).
  *
  * Engine path: alternating large-star / small-star rounds (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
  * public algorithm): each round is a grouped min + join-back, and the
  * edge set converges to per-component stars in O(log²·) rounds even
  * on pathological chain graphs — unlike plain min-label propagation,
  * whose round count is the graph diameter. (Min-label is kept as
  * [[minLabelPropagation]]: simpler, fine for clique-like dup classes,
  * and the spec cross-checks the two on crafted graphs.)
  */
object Clustering {

  /** Past this many distinct edges the bounded driver kernel is skipped
    * and the star contraction runs. Honest heap budget at the 4M cap:
    * the tuple collect materializes ~4M boxed pairs (~130-250 MB),
    * the id remap holds ≤8M boxed HashMap entries (~500 MB worst), and
    * the union-find arrays are two 16 MB int buffers — ≲1 GB transient
    * on a driver, all released before the plan returns. Same
    * bounded-collect budget class as GraphMetrics' 128 MB bitset cap,
    * and like that cap it must not be raised without re-auditing the
    * driver heap story. A graph PAST the cap also pays one cap+1-row
    * collect before falling back — the price of the one-job chooser.
    * The gate is EXACT (the limit(cap+1) collect either fits or
    * overflows by one row), so no approx margin is needed.
    */
  private[graft] val MaxLocalEdges = 4000000L

  /** Connected components over an undirected edge list (src, dst):
    * returns (node, component) with component = min node id reachable.
    * Only nodes appearing in edges are labeled.
    *
    * Adaptive (the GraphMetrics kernel discipline): the edge relation
    * every caller feeds this is MATCH-bounded — LSH candidate pairs,
    * fuzzy-linkage matches — i.e. ≪ the corpus that produced it. When
    * the exact distinct-edge count is ≤ [[MaxLocalEdges]] the O(log²)
    * star rounds (≈5-7 chained jobs, each paying the 0.1-0.3 s/job
    * scheduling floor) collapse to ONE bounded collect + a driver
    * union-find, integer-exact by construction (labels are min
    * reachable ids — set semantics, no float discipline needed; the
    * kernel-equality spec in ClusteringSpec is the whole correctness
    * claim). Past the cap the star contraction runs unchanged, so
    * nothing edge-count-unbounded ever reaches the driver. NOTE the
    * kernel works eagerly at construction (count + collect happen at
    * plan-build time) — bench with GRAFT_REBUILD=1 like the other
    * adaptive kernels.
    *
    * `maxLocalEdges` is a spec knob (0 forces the distributed path);
    * production callers use the default.
    */
  def connectedComponentsStar(edges0: DataFrame, maxRounds: Int = 20,
      maxLocalEdges: Long = MaxLocalEdges): DataFrame = {
    // localCheckpoint (eager) after every round: an iterative plan that
    // references its previous round several times (union + join + the
    // convergence signature) grows the LOGICAL tree exponentially —
    // caching truncates execution but not analysis, and by ~round 8
    // DeduplicateRelations alone takes minutes (measured). Physical
    // truncation keeps every round's plan O(round size).
    val dedup = edges0
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    // The chooser and the kernel's input are ONE job: distinct →
    // limit(cap+1) → collect. The limit bounds the driver footprint
    // (never more than cap+1 rows land, however big the graph), the
    // overflow row IS the chooser verdict, and no separate count or
    // checkpoint job runs on the common bounded path. The fallback
    // re-derives the distinct once for its own checkpoint — the rare
    // >cap case pays one extra pass, not the common case three jobs.
    val capRows = math.min(maxLocalEdges, (Int.MaxValue - 1).toLong).toInt
    val spark0 = edges0.sparkSession
    val sample = { // primitive-pair collect, never Array[Row] (boxing ~3×)
      import spark0.implicits._
      dedup.limit(capRows + 1).as[(Long, Long)].collect()
    }
    // maxLocalEdges = 0 must force the DISTRIBUTED path even on an
    // empty edge set (the knob's contract for specs), hence the > 0
    if (maxLocalEdges > 0 && sample.length <= maxLocalEdges)
      return localUnionFind(spark0, sample)
    var edges = dedup.localCheckpoint(true)
    var prevSig: (Long, Long) = (-1L, -1L)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // ---- large-star: for every node u, attach its LARGER neighbors
      // to m(u) = min(Γ(u) ∪ {u})
      val dir = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val mins = dir.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      val ls = dir
        .join(mins, Seq("src"))
        .withColumn("m", least(col("mn"), col("src")))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
      // ---- small-star: direct edges large→small, attach every smaller
      // neighbor (and u itself) to the minimum
      val hiLo = ls.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      val mins2 = hiLo.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withM = hiLo.join(mins2, Seq("u"))
      val ss = withM.select(col("v").as("src"), col("m").as("dst"))
        .unionByName(withM.select(col("u").as("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true)
      val sig = ss.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst"))))
        .head()
      val newSig = (sig.getLong(0), if (sig.isNullAt(1)) 0L else sig.getLong(1))
      edges = ss
      converged = newSig == prevSig
      prevSig = newSig
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar: signature fixpoint not reached within $maxRounds " +
        "rounds — component labels would be silently split; raise maxRounds " +
        "(star contraction converges in O(log^2 n) rounds)")
    // fixpoint: edges are (child → root) stars; roots label themselves
    edges.select(col("src").as("node"), col("dst").as("component"))
      .unionByName(edges.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
  }

  /** Bounded driver kernel: union-find (path-halving find, min-index
    * root wins the union) over the collected edge list, then one pass
    * assigning each node the MINIMUM member id of its set — exactly the
    * star contraction's label convention, independent of union order.
    * Caller guarantees rows.length ≤ [[MaxLocalEdges]] and that rows
    * are already src≠dst-filtered, long-cast and distinct.
    */
  private def localUnionFind(spark: SparkSession, rows: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    // dense re-index: node id -> [0, n)
    val idx = new java.util.HashMap[java.lang.Long, Integer](rows.length * 4)
    val ids = new scala.collection.mutable.ArrayBuffer[Long](rows.length * 2)
    def ix(v: Long): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue
      else { val i = ids.length; ids += v; idx.put(v, Integer.valueOf(i)); i }
    }
    val ea = new Array[Int](rows.length)
    val eb = new Array[Int](rows.length)
    var i = 0
    while (i < rows.length) {
      ea(i) = ix(rows(i)._1); eb(i) = ix(rows(i)._2); i += 1
    }
    val n = ids.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    i = 0
    while (i < rows.length) {
      val ra = find(ea(i)); val rb = find(eb(i))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      i += 1
    }
    // label = min node id in the set (NOT min index — insertion order
    // is edge order, which carries no meaning)
    val rootMin = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val r = find(j)
      if (ids(j) < rootMin(r)) rootMin(r) = ids(j)
      j += 1
    }
    val out = new Array[(Long, Long)](n)
    j = 0
    while (j < n) { out(j) = (ids(j), rootMin(find(j))); j += 1 }
    spark.createDataset(out.toIndexedSeq).toDF("node", "component")
  }

  /** Reference implementation: per-round min-label propagation
    * (rounds ≤ diameter). Spec-compared against the star variant.
    */
  private[graft] def minLabelPropagation(pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "nb_label"), Seq("dst"))
        .select(col("src").as("node"), col("nb_label").as("label"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old_label"),
        Seq("node"))
        .where(col("label") =!= col("old_label"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    labels
  }

  /** (doc_id, cluster_id) for every doc in ≥1 LSH candidate pair;
    * cluster_id = min doc_id reachable through the pair graph.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponentsStar(pairs)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
  }

  // DuckDB oracle: full transitive closure by recursive CTE over the
  // symmetric edge list, component id = min reachable doc (quadratic
  // in component size — fine for an oracle, not a scale path).
  private val dedupClustersSql =
    s"""WITH RECURSIVE lsh AS (${Dedup.dedupMinhashLshSql}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM lsh
       |  UNION
       |  SELECT doc_b, doc_a FROM lsh),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM reach GROUP BY src""".stripMargin

  /** Canonical-document election per duplicate cluster: the KEEP
    * decision a dedup pipeline actually ships — each cluster keeps its
    * highest-quality member (longest document; doc_id tie-break), and
    * the member count is reported for audit. Quality-aware retention
    * beats [[dedupClusters]]'s min-id convention when duplicates
    * differ in truncation/extraction quality.
    *
    * Scale shape: the cluster relation is duplicate-bounded (≪
    * corpus), so its join against the documents table broadcasts; the
    * election window partitions by cluster over that small relation
    * only.
    */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dedupClusters(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("cluster_id"))
    docs.join(broadcast(clusters), Seq("doc_id"))
      .withColumn("rk", row_number().over(
        w.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .withColumn("n_members", count(lit(1)).over(w))
      .where(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("canonical_doc"),
        col("n_chars").as("canonical_chars"), col("n_members"))
  }

  private val dedupCanonicalSql =
    s"""WITH RECURSIVE lsh AS (${Dedup.dedupMinhashLshSql}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM lsh
       |  UNION
       |  SELECT doc_b, doc_a FROM lsh),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |clusters AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT cluster_id, doc_id AS canonical_doc,
       |  n_chars AS canonical_chars, n_members FROM (
       |  SELECT c.cluster_id, c.doc_id, d.n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk,
       |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members
       |  FROM clusters c JOIN documents d USING (doc_id))
       |WHERE rk = 1""".stripMargin

  // declared LAST: Scala object vals initialize in declaration order,
  // and this list must see every oracle string already constructed
  val ops: Seq[Op] = Seq(
    Op("dedup_clusters", (s, d) => dedupClusters(s, d), Some(dedupClustersSql),
      bench = true),
    Op("dedup_canonical", (s, d) => dedupCanonical(s, d), Some(dedupCanonicalSql)),
  )
}
