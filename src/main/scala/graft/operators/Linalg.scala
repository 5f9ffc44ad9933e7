package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.GraftFunctions.{sum_order_free, vec_dot}

/** Distributed numerical linear algebra over the embedding corpus —
  * the decomposition step LLM-data pipelines run for semantic dedup
  * preconditioning, embedding whitening, and drift monitoring.
  *
  * `pca_power` extracts the TOP PRINCIPAL COMPONENT of the (mean-
  * centered) embedding matrix by unrolled power iteration: v_{r+1} =
  * normalize(Xᵀ(X v_r)) — the `pagerank`/`logreg_train` shape applied
  * to eigendecomposition. Emits (round, dim, loading, lambda) so the
  * convergence of both the direction and the eigenvalue estimate is
  * auditable across rounds.
  *
  * Scale shape (the 100 TB contract):
  *  - each round is ONE corpus aggregation: the per-row score x·v is a
  *    row-local codegen'd fold (`vec_dot`); the d per-dim sums
  *    Σ score·x_j combine map-side. Nothing corpus-sized shuffles —
  *    the exchange payload is d=64 partial rows per task.
  *  - all driver-visible state is O(d): the mean vector, the iterate,
  *    and the 1-row norm, each broadcast back into the plan. The whole
  *    training is one lazy composition; no loop state leaves the plan.
  *  - cross-engine determinism: the fold runs in FIXED list order on
  *    both engines (vec_dot ≡ DuckDB list_reduce); every
  *    aggregation-order-dependent sum uses the round-15 → DECIMAL
  *    discipline (`sum_order_free`); the iterate re-canonicalizes at
  *    12 dp per round exactly like pagerank's rank vector, so a
  *    last-ulp division drift cannot compound.
  */
object Linalg {

  private val Dim = 64
  private val Rounds = 3

  /** vec_id, centered double vector cv — shared by every round. */
  private def centered(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mu = e
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(round(sum_order_free(col("x")) / count(lit(1)), 12).as("m"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("mv"))
    e.crossJoin(broadcast(mu))
      .select(col("vec_id"),
        zip_with(col("v"), col("mv"), (a, b) => a - b).as("cv"))
  }

  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val c = centered(spark, dir)
    // v_0 = (1/8, ..., 1/8): unit vector, exact in binary floating point
    var state = spark.range(1)
      .select(array_repeat(lit(0.125), Dim).as("vv"))
    val rows = (1 to Rounds).map { r =>
      val w = c.crossJoin(broadcast(state))
        .select(col("cv"), vec_dot(col("cv"), col("vv")).as("s"))
        .select(col("s"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(sum_order_free(col("s") * col("x")).as("w"))
      val nrm = w.agg(sqrt(sum_order_free(col("w") * col("w"))).as("nrm"))
      val it = w.crossJoin(broadcast(nrm))
        .select(col("dim"), round(col("w") / col("nrm"), 12).as("loading"),
          col("nrm"))
      state = it.groupBy()
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("loading")))),
          s => s.getField("loading")).as("vv"))
      it.select(lit(r).as("round"), col("dim"), col("loading"),
        round(col("nrm"), 9).as("lambda"))
    }
    rows.reduce(_ unionAll _)
  }

  // ---- oracle: the identical unrolled rounds as CTEs ----------------

  // the ONE sequential-fold dot-product spelling, shared with the
  // similarity family — an edit to the fold discipline there cannot
  // leave these oracles validating different arithmetic
  private def dotSql(a: String, b: String): String = Similarity.dotSql(a, b)

  private def ofSum(term: String): String =
    s"CAST(SUM(CAST(round($term, 15) AS DECIMAL(28,15))) AS DOUBLE)"

  private def roundSql(r: Int): String =
    s"""s$r AS (SELECT cv, ${dotSql("cv", "vv")} AS s FROM c, v${r - 1}),
       |w$r AS (
       |  SELECT CAST(dim AS INTEGER) AS dim, ${ofSum("s * cv[dim + 1]")} AS w
       |  FROM s$r, UNNEST(range(0, $Dim)) AS t(dim)
       |  GROUP BY 1),
       |n$r AS (SELECT sqrt(${ofSum("w * w")}) AS nrm FROM w$r),
       |it$r AS (
       |  SELECT dim, round(w / nrm, 12) AS loading, nrm
       |  FROM w$r, n$r),
       |v$r AS (SELECT list(loading ORDER BY dim) AS vv FROM it$r)""".stripMargin

  private val pcaPowerSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |ex AS (
       |  SELECT vec_id, CAST(dim AS INTEGER) AS dim, v[dim + 1] AS x
       |  FROM e, UNNEST(range(0, $Dim)) AS t(dim)),
       |mu AS (
       |  SELECT dim, round(${ofSum("x")} / count(*), 12) AS m
       |  FROM ex GROUP BY dim),
       |muv AS (SELECT list(m ORDER BY dim) AS mv FROM mu),
       |c AS (
       |  SELECT vec_id,
       |    list_transform(range(1, len(v) + 1), i -> v[i] - mv[i]) AS cv
       |  FROM e, muv),
       |v0 AS (SELECT list_transform(range(1, $Dim + 1), i -> 0.125) AS vv),
       |${(1 to Rounds).map(roundSql).mkString(",\n")}
       |${(1 to Rounds)
          .map(r => s"SELECT $r AS round, dim, loading, round(nrm, 9) AS lambda FROM it$r")
          .mkString("\nUNION ALL\n")}""".stripMargin

  /** Per-dimension standardization ("whitening" in the diagonal
    * approximation): z_j = (x_j − μ_j)/σ_j with corpus-wide μ/σ — the
    * normalization step before cosine-based semantic dedup or k-means,
    * so no dimension dominates by scale.
    *
    * Scale shape: ONE corpus aggregation produces the 64 (μ, σ) pairs
    * (map-side-combined, order-free decimal sums); they broadcast back
    * as two arrays and the transform is a pure row-local map fused
    * into the scan. μ and E[x²] canonicalize at 12 dp so σ — and
    * therefore every output element — is an exact function of
    * identical inputs on both engines; outputs round at 9 dp.
    */
  def embeddingWhiten(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val st = e
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(round(sum_order_free(col("x")) / count(lit(1)), 12).as("mu"),
        round(sum_order_free(col("x") * col("x")) / count(lit(1)), 12).as("ex2"))
      .select(col("dim"), col("mu"),
        sqrt(col("ex2") - col("mu") * col("mu")).as("sg"))
    val sa = st.groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          s => s.getField("mu")).as("mv"),
        transform(array_sort(collect_list(struct(col("dim"), col("sg")))),
          s => s.getField("sg")).as("sv"))
    // nullif guards a zero-variance (constant) dimension: without it
    // Spark emits NaN/Infinity where DuckDB emits NULL (review r14) —
    // a degenerate dimension must read as "no information" on both
    e.crossJoin(broadcast(sa))
      .select(col("vec_id"),
        expr(s"transform(sequence(0, ${Dim - 1}), " +
          "i -> round((v[i] - mv[i]) / nullif(sv[i], 0D), 9))").as("w"))
  }

  /** Driver-registry spelling of [[embeddingWhiten]]: long-form
    * (vec_id, dim, w) scalar rows instead of one array<double> column.
    * The r7 scorecard showed the driver canonizer cannot sort/hash
    * array cells (the third recurrence of the r1/r5 class), so the
    * REGISTERED query explodes to the `random_projection` shape —
    * proven canonizer-safe for 7 rounds — while the array API above
    * stays the library surface. `+ 0.0` normalizes a possible IEEE
    * −0.0 from round() so both engines hash the same zero.
    */
  def embeddingWhitenLong(spark: SparkSession, dir: String): DataFrame =
    embeddingWhiten(spark, dir)
      .select(col("vec_id"), posexplode(col("w")).as(Seq("dim", "w")))
      .select(col("vec_id"), col("dim"), (col("w") + lit(0.0)).as("w"))

  private val embeddingWhitenSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |ex AS (
       |  SELECT vec_id, CAST(dim AS INTEGER) AS dim, v[dim + 1] AS x
       |  FROM e, UNNEST(range(0, $Dim)) AS t(dim)),
       |st AS (
       |  SELECT dim, round(${ofSum("x")} / count(*), 12) AS mu,
       |    round(${ofSum("x * x")} / count(*), 12) AS ex2
       |  FROM ex GROUP BY dim),
       |sa AS (
       |  SELECT list(mu ORDER BY dim) AS mv,
       |    list(sqrt(ex2 - mu * mu) ORDER BY dim) AS sv
       |  FROM st)
       |SELECT vec_id, CAST(dim AS INTEGER) AS dim,
       |  round((v[dim + 1] - mv[dim + 1]) / nullif(sv[dim + 1], 0.0), 9)
       |    + 0.0 AS w
       |FROM e, sa, UNNEST(range(0, $Dim)) AS t(dim)""".stripMargin

  // ------------------------------------------------- random projection

  private val ProjK = 16

  /** Johnson–Lindenstrauss sign projection to [[ProjK]] dimensions:
    * y_j = (Σ_i v_i · s_ij)/√[[ProjK]] with s_ij ∈ {−1, +1} drawn
    * deterministically from the portable content hash of (j, i) — the
    * dimensionality-reduction step before a cheaper ANN index or a
    * coarser LSH, reproducible across engines, runs, and cluster
    * sizes (no RNG state to ship).
    *
    * Scale shape: the 16×64 sign matrix is a 16-row broadcast built
    * from literals (never touches the corpus); the projection itself
    * is a row-local codegen'd fold (`vec_dot`) per (vector, j) — no
    * exchange AT ALL: the output stays long-form (vec_id, j, y).
    * √16 = 4 makes the final scaling an exact binary division.
    */
  def randomProjection(spark: SparkSession, dir: String): DataFrame = {
    val signs = spark.range(ProjK).select(col("id").cast("int").as("j"))
      .select(col("j"), explode(sequence(lit(0), lit(Dim - 1))).as("i"))
      .select(col("j"), col("i"),
        when(graft.functions.CrossHash.hash60(
          concat(col("j").cast("string"), lit("_"), col("i").cast("string")))
          % 2 === 0, lit(1.0)).otherwise(lit(-1.0)).as("sign"))
      .groupBy(col("j"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("sign")))),
        s => s.getField("sign")).as("sgn"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .crossJoin(broadcast(signs))
      .select(col("vec_id"), col("j"),
        round(vec_dot(col("v"), col("sgn")) / 4, 9).as("y"))
  }

  private val randomProjectionSql = {
    val h = graft.functions.CrossHash.hash60Sql(
      "CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)")
    s"""WITH cells AS (
       |  SELECT CAST(j AS INTEGER) AS j, CAST(i AS INTEGER) AS i,
       |    CASE WHEN $h % 2 = 0 THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(-1.0 AS DOUBLE) END AS sign
       |  FROM range(0, $ProjK) t(j), range(0, $Dim) u(i)),
       |m AS (SELECT j, list(sign ORDER BY i) AS sgn FROM cells GROUP BY 1),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings)
       |SELECT vec_id, j, round(${dotSql("v", "sgn")} / 4, 9) AS y
       |FROM e, m""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("pca_power", pcaPower, Some(pcaPowerSql)),
    Op("embedding_whiten", embeddingWhitenLong, Some(embeddingWhitenSql)),
    Op("random_projection", randomProjection, Some(randomProjectionSql)),
  )
}
