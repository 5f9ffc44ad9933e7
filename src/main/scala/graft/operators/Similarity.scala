package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.GraftFunctions.{sum_order_free, vec_dot}

/** Similarity search over the embeddings table (Array[Float], dim 64).
  *
  * Baseline: brute-force cosine top-k (query set × corpus). Scale path:
  * sign-LSH bucketing — hyperplane sign bits bound each probe to one
  * bucket, so the join is equi on the bucket key instead of a full
  * cross product — and IVF inverted lists.
  *
  * Float-parity policy: [[graft.functions.DotExpr]] casts each element
  * float→double (exact) and folds sequentially in index order — the
  * identical IEEE double operation sequence as DuckDB's
  * `list_reduce(list_transform(...))`, so results compare bit-for-bit.
  * r2: the dot product is a codegen'd Catalyst expression (r1's
  * `aggregate(zip_with(...))` HOF never entered whole-stage codegen),
  * and the raw float array — not a double copy — is what rides through
  * broadcasts and shuffles (half the bytes).
  */
object Similarity {

  /** vec_id, v (raw array<float>), nrm — the shared scan projection. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"))

  private val vecSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  private[operators] def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (acc, v) -> acc + v)"

  private val embSql =
    s"""SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings""".stripMargin

  /** Sign-LSH bucket key: sign bits of 4 fixed coordinate hyperplanes.
    * Float >= 0 and double >= 0 agree, so computing it on the raw float
    * array matches the oracle's double-cast spelling.
    */
  private val bucket: Column = (0 until 4)
    .map(i => when(element_at(col("v"), i * 16 + 1) >= 0, lit(1)).otherwise(lit(0))
      * lit(1 << i))
    .reduce((a: Column, b: Column) => a + b)

  private val bucketSql = (0 until 4)
    .map(i => s"(CASE WHEN v[${i * 16 + 1}] >= 0 THEN 1 ELSE 0 END) * ${1 << i}")
    .mkString(" + ")

  /** Brute-force cosine top-k: query set = vec_id < 10, corpus =
    * everything else; rank by cosine desc with vec_id tie-break.
    * Query side is tiny => broadcast; corpus side never shuffles until
    * the per-query top-k (window keyed on query_id).
    */
  def annCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val sim = (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), sim)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
  }

  private val annCosineTopkSql = {
    val dotQC = dotSql("qv", "cv")
    s"""WITH emb AS ($embSql),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM emb WHERE vec_id < 10),
       |c AS (SELECT vec_id AS cand_id, v AS cv, nrm AS cn FROM emb),
       |scored AS (
       |  SELECT query_id, cand_id, $dotQC / (qn * cn) AS cosine
       |  FROM c CROSS JOIN q WHERE query_id != cand_id)
       |SELECT query_id, cand_id, cosine, rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, cand_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= 5""".stripMargin
  }

  /** Sign-LSH bucketed ANN (the 100 TB path): candidates are joined
    * only within the probe's bucket, then ranked. Recall < 1 by
    * construction — that's the LSH trade — but the bucket join replaces
    * the cross product with an equi-join.
    */
  def annLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", bucket)
    val q = e.where(col("vec_id") < 10)
      .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val sim = (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    e.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), sim)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
  }

  private val annLshBucketedSql = {
    val dotQC = dotSql("qv", "cv")
    s"""WITH emb AS ($embSql),
       |bucketed AS (SELECT vec_id, v, nrm, $bucketSql AS bucket FROM emb),
       |q AS (SELECT bucket, vec_id AS query_id, v AS qv, nrm AS qn
       |      FROM bucketed WHERE vec_id < 10),
       |c AS (SELECT bucket, vec_id AS cand_id, v AS cv, nrm AS cn FROM bucketed),
       |scored AS (
       |  SELECT query_id, cand_id, $dotQC / (qn * cn) AS cosine
       |  FROM c JOIN q USING (bucket) WHERE query_id != cand_id)
       |SELECT query_id, cand_id, cosine, rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, cand_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= 3""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs, sign-LSH blocked (the 100 TB
    * shape, VERDICT r1 #3/#6): candidate pairs come from an equi-join on
    * the sign bucket — candidates ∝ bucket collisions, never the full
    * n² cross product. Recall trade: a near-dup pair straddling a
    * hyperplane (one coordinate sign flip) is missed; for cosine ≥ 0.8
    * near-dups the sign bits almost always agree. The unblocked exact
    * variant remains as [[embeddingNearDupExact]] for small sets.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", bucket)
    val a = e.select(col("bucket"), col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (vec_dot(col("av"), col("bv")) / (col("an") * col("bn"))).as("cosine"))
      .where(col("cosine") >= 0.8)
  }

  private val embeddingNearDupSql = {
    val dotAB = dotSql("av", "bv")
    s"""WITH emb AS ($embSql),
       |bucketed AS (SELECT vec_id, v, nrm, $bucketSql AS bucket FROM emb),
       |a AS (SELECT bucket, vec_id AS a_id, v AS av, nrm AS an FROM bucketed),
       |b AS (SELECT bucket, vec_id AS b_id, v AS bv, nrm AS bn FROM bucketed)
       |SELECT a_id, b_id, $dotAB / (an * bn) AS cosine
       |FROM a JOIN b USING (bucket)
       |WHERE a_id < b_id AND $dotAB / (an * bn) >= 0.8""".stripMargin
  }

  /** Exact all-pairs near-dup — O(n²) by definition; small-set escape
    * hatch only (spec-verified superset of the blocked variant). NOT the
    * scale path: at 100 TB use [[embeddingNearDup]] (sign-LSH blocked)
    * or MinHash/SimHash on the text side.
    */
  def embeddingNearDupExact(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"))
    a.crossJoin(b)
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (vec_dot(col("av"), col("bv")) / (col("an") * col("bn"))).as("cosine"))
      .where(col("cosine") >= 0.8)
  }

  /** IVF-style ANN (the other classic scale path): a deterministic
    * coarse codebook (every 50th vector), each corpus vector assigned
    * to its nearest centroid (the "inverted list" key), probes search
    * only their centroid's list. At 100 TB the assignment is one
    * broadcast-join pass and each probe touches |corpus|/nlist rows.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val csim = (vec_dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(csim.desc, col("c_id").asc)
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("rnk", row_number().over(wAssign))
      .where(col("rnk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("list_id"))
    val probes = assigned.where(col("vec_id") < 10)
      .select(col("list_id"), col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val sim = (vec_dot(col("qv"), col("cv2")) / (col("qn") * col("cn2"))).as("cosine")
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    assigned
      .select(col("list_id"), col("vec_id").as("cand_id"),
        col("v").as("cv2"), col("nrm").as("cn2"))
      .join(broadcast(probes), Seq("list_id"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), sim)
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= 3)
  }

  private val annIvfSql = {
    val csim = s"${dotSql("v", "cv")} / (nrm * cn)"
    val sim = s"${dotSql("qv", "cv2")} / (qn * cn2)"
    s"""WITH emb AS ($embSql),
       |centroids AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM emb WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS list_id FROM (
       |    SELECT emb.vec_id, emb.v, emb.nrm, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY emb.vec_id
       |        ORDER BY $csim DESC, c.c_id ASC) AS rnk
       |    FROM emb CROSS JOIN centroids c)
       |  WHERE rnk = 1),
       |probes AS (
       |  SELECT list_id, vec_id AS query_id, v AS qv, nrm AS qn
       |  FROM assigned WHERE vec_id < 10),
       |cands AS (
       |  SELECT list_id, vec_id AS cand_id, v AS cv2, nrm AS cn2 FROM assigned)
       |SELECT query_id, cand_id, cosine, rnk FROM (
       |  SELECT query_id, cand_id, $sim AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY $sim DESC, cand_id ASC) AS rnk
       |  FROM cands JOIN probes USING (list_id)
       |  WHERE query_id != cand_id)
       |WHERE rnk <= 3""".stripMargin
  }

  /** Symmetric int8 quantization of the embedding column — the storage
    * layout step before shipping vectors to an ANN index: per-vector
    * scale = max|v|/127, q_i = round(v_i/scale), plus the integer
    * checksums and the reconstruction RMSE a pipeline asserts on.
    *
    * Pure per-row map — no shuffle at any scale. All lane math is
    * float→double (exact) then identical IEEE double ops in array
    * order, so the integer outputs are bit-equal across engines; the
    * two double outputs round to 9 decimals. A zero vector yields NULL
    * scale (nullif) rather than a division by zero, in both engines.
    * Element ops ride Spark's array HOFs (interpreted) — acceptable
    * off the bench path; the codegen'd escape hatch is the DotExpr
    * pattern if quantization ever becomes the bottleneck.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    // the raw rmse/sums are staged in withColumns BEFORE the select
    // that aliases `round(qscale, 9)` back to the name "qscale":
    // inside one projection, a lambda's col("qscale") resolves
    // laterally to the sibling alias (the rounded value), silently
    // changing the error term — staging keeps every reference bound
    // to the unrounded child column.
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("qscale",
        nullif(array_max(transform(col("v"), x => abs(x))) / lit(127.0), lit(0.0)))
      .withColumn("q",
        transform(col("v"), x => round(x / col("qscale")).cast("long")))
      .withColumn("q_sum", aggregate(col("q"), lit(0L), (acc, x) => acc + x))
      .withColumn("q_l1", aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)))
      .withColumn("rmse_raw", sqrt(
        aggregate(zip_with(col("v"), col("q"),
            (v, q) => (v - q * col("qscale")) * (v - q * col("qscale"))),
          lit(0.0), (acc, x) => acc + x) / size(col("v"))))
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("n_dims"),
        round(col("qscale"), 9).as("qscale"),
        col("q_sum"), col("q_l1"),
        round(col("rmse_raw"), 9).as("rmse"))

  private val embeddingQuantizeSql =
    s"""WITH base AS (
       |  SELECT vec_id, $vecSql AS v,
       |    nullif(CAST(list_max(list_transform(embedding,
       |      x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)
       |      / CAST(127 AS DOUBLE), CAST(0 AS DOUBLE)) AS qscale
       |  FROM embeddings),
       |qd AS (
       |  SELECT vec_id, v, qscale,
       |    list_transform(v, x -> CAST(round(x / qscale) AS BIGINT)) AS q
       |  FROM base)
       |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
       |  round(qscale, 9) AS qscale,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), q),
       |    (acc, x) -> acc + x) AS q_sum,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(q, x -> abs(x))), (acc, x) -> acc + x) AS q_l1,
       |  round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, len(v) + 1),
       |      i -> (v[i] - q[i] * qscale) * (v[i] - q[i] * qscale))),
       |    (acc, x) -> acc + x) / len(v)), 9) AS rmse
       |FROM qd""".stripMargin

  /** kNN classification by majority vote: each query vector takes the
    * modal label of its 10 nearest neighbors (cosine; self excluded),
    * ties broken toward the smaller label — the eval-time labeling
    * primitive on top of the ANN family. Votes and labels are exact
    * integers, so the result is oracle-exact even though the distance
    * is floating (the bit-parity dot product decides the SAME top-10
    * in both engines).
    *
    * Scale shape: identical to [[annCosineTopk]] — query set
    * broadcasts, corpus never shuffles before the per-query top-k
    * (WindowGroupLimit partials); the vote count then touches only
    * queries × 10 rows.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"), col("label"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("nrm").as("cn"), col("label"))
    val sim = (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine")
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("label"), sim)
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= 10)
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .where(col("vr") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }

  private val knnClassifySql = {
    val dotQC = dotSql("qv", "cv")
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v, label,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM emb WHERE vec_id < 10),
       |c AS (SELECT vec_id AS cand_id, v AS cv, nrm AS cn, label FROM emb),
       |top10 AS (
       |  SELECT query_id, label FROM (
       |    SELECT query_id, cand_id, label,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY $dotQC / (qn * cn) DESC, cand_id ASC) AS rnk
       |    FROM c CROSS JOIN q WHERE query_id != cand_id)
       |  WHERE rnk <= 10),
       |votes AS (
       |  SELECT query_id, label, count(*) AS votes
       |  FROM top10 GROUP BY 1, 2)
       |SELECT query_id, label AS predicted_label, votes FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY votes DESC, label ASC) AS vr
       |  FROM votes)
       |WHERE vr = 1""".stripMargin
  }

  /** Nearest-centroid classification + confusion matrix: every vector
    * is assigned the label of its closest class centroid (squared L2
    * against [[labelCentroids]]' exact means), and (true, predicted)
    * pairs are counted — the eval step that closes the loop on the
    * embedding family. The centroid relation is |labels|×|dims| long
    * form, pivoted per-vector by a broadcast join + per-dim product
    * sum; everything after the one dim exchange is label²-sized.
    *
    * Distance spelled as −2·v·c + ‖c‖² (the ‖v‖² term is constant per
    * vector and cannot change the argmin); both terms come from exact
    * decimal centroid means rounded to 9 dp, so the argmin is decided
    * identically in both engines.
    */
  def centroidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cent = labelCentroids(spark, dir)
      .select(col("label").as("c_label"), col("dim"), col("mean"))
    val expl = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
    // order-free sums (the pagerank lesson — see sum_order_free) so the
    // argmin score is identical under any aggregation order
    val scored = expl.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("c_label"))
      .agg((round(graft.functions.GraftFunctions.sum_order_free(
          col("x").cast("double") * col("mean")), 9) * -2.0
        + round(graft.functions.GraftFunctions.sum_order_free(
          col("mean") * col("mean")), 9)).as("score"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").asc, col("c_label").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .groupBy(col("label"), col("c_label").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  // lazy: interpolates labelCentroidsSql, which is declared later in
  // this object — a strict val would capture null at init (the
  // RegistrySpec guard catches null oracles but not null SPLICES)
  private lazy val centroidConfusionSql =
    s"""WITH cent AS ($labelCentroidsSql),
       |expl AS (
       |  SELECT vec_id, label, CAST(dim - 1 AS INTEGER) AS dim,
       |    CAST(x AS DOUBLE) AS x
       |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
       |          generate_subscripts(embedding, 1) AS dim
       |        FROM embeddings)),
       |scored AS (
       |  SELECT e.vec_id, e.label, c.label AS c_label,
       |    round(CAST(SUM(CAST(round(e.x * c.mean, 15) AS DECIMAL(28,15))) AS DOUBLE), 9) * -2.0
       |      + round(CAST(SUM(CAST(round(c.mean * c.mean, 15) AS DECIMAL(28,15))) AS DOUBLE), 9) AS score
       |  FROM expl e JOIN cent c ON e.dim = c.dim
       |  GROUP BY 1, 2, 3)
       |SELECT label, c_label AS predicted, count(*) AS n FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY score ASC, c_label ASC) AS rk
       |  FROM scored)
       |WHERE rk = 1
       |GROUP BY 1, 2""".stripMargin

  /** One Lloyd assignment step with deterministic seeds (the k first
    * vectors as centroids): each vector → its nearest centroid by
    * squared L2, spelled ||v||² − 2·v·c + ||c||² from three bit-parity
    * dot products so the argmin is decided identically in both
    * engines. The distributed-ML primitive under k-means/IVF training:
    * centroids broadcast, the corpus never shuffles, per-vector work
    * is k dot products.
    */
  /** Nearest-of-the-8-deterministic-seeds assignment — the ONE spelling
    * shared by [[kmeansAssign]] and [[semDedup]] (an edit to the
    * distance expression or tie-break here changes both together, so
    * their argmins can never silently de-synchronize). Returns
    * (vec_id, v, nrm, cluster, d2); callers project what they need and
    * Catalyst prunes the rest back into the scan.
    */
  private def seedAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val c = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val d2 = (vec_dot(col("v"), col("v"))
      - lit(2.0) * vec_dot(col("v"), col("cv"))
      + vec_dot(col("cv"), col("cv"))).as("d2")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cid").asc)
    e.crossJoin(broadcast(c))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"), d2)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"),
        col("cid").as("cluster"), col("d2"))
  }

  /** CTE chain ending in `assigned(vec_id, v, nrm, cluster, d2)` —
    * the oracle mirror of [[seedAssign]], shared the same way.
    */
  private val seedAssignSql = {
    val dVV = dotSql("v", "v")
    val dVC = dotSql("v", "cv")
    val dCC = dotSql("cv", "cv")
    s"""emb AS ($embSql),
       |c AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 8),
       |scored AS (
       |  SELECT vec_id, v, nrm, cid,
       |    $dVV - 2.0 * $dVC + $dCC AS d2
       |  FROM emb CROSS JOIN c),
       |assigned AS (
       |  SELECT vec_id, v, nrm, cid AS cluster, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2 ASC, cid ASC) AS rk
       |    FROM scored)
       |  WHERE rk = 1)""".stripMargin
  }

  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    seedAssign(spark, dir)
      .select(col("vec_id"), col("cluster"), round(col("d2"), 9).as("dist2"))

  private val kmeansAssignSql =
    s"""WITH $seedAssignSql
       |SELECT vec_id, cluster, round(d2, 9) AS dist2 FROM assigned""".stripMargin

  /** Full Lloyd iterations on DataFrames — assignment as in
    * [[kmeansAssign]] (centroids broadcast as a literal relation), new
    * centroids as per-dimension DECIMAL-exact means (posexplode →
    * (cluster, dim) partial-aggregated sums — aggregation order can
    * never change the result), centroids collected driver-side between
    * rounds exactly like production k-means (k×dim doubles). Returns
    * the per-iteration inertia trace; spec asserts it never increases.
    */
  def kmeansIterate(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 3): Seq[Double] = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .cache()
    var centroids: Array[(Int, Array[Double])] = e.where(col("vec_id") < k)
      .orderBy(col("vec_id"))
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Float](1).map(_.toDouble).toArray
      }
    val inertia = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val cdf = centroids.toSeq
        .toDF("cid", "cv_d")
        .select(col("cid"), col("cv_d").cast("array<float>").as("cv"))
      val d2 = vec_dot(col("v"), col("v"))
        .minus(lit(2.0) * vec_dot(col("v"), col("cv")))
        .plus(vec_dot(col("cv"), col("cv"))).as("d2")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cid").asc)
      val assigned = e.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("cid"), col("v"), d2)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .cache()
      inertia += assigned.agg(sum(col("d2").cast(DecimalType28)).cast("double"))
        .head().getDouble(0)
      val next = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x").cast(DecimalType28)) / count(lit(1)))
          .cast("double").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          val a = new Array[Double](64)
          rows.foreach(r => a(r.getInt(1)) = r.getDouble(2))
          cid -> a
        }.toArray.sortBy(_._1)
      assigned.unpersist()
      centroids = next
    }
    e.unpersist()
    inertia.result()
  }

  private val DecimalType28 = org.apache.spark.sql.types.DecimalType(28, 12)

  /** Per-label mean embedding (class centroids) in long form: the
    * supervised counterpart of the k-means step — prototype vectors
    * for nearest-centroid classification and per-class drift checks.
    * Per-dimension DECIMAL-exact sums (order-free) divided as doubles,
    * so 512 (label, dim) cells are oracle-exact. One exchange,
    * map-side combined: the explode multiplies rows ×64 but the
    * partial aggregate collapses them before the shuffle.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        // float → SHORTEST STRING → decimal: engines disagree on
        // direct float/double→decimal quantization (shortest-repr vs
        // full binary expansion rounding), but both print a float's
        // unique shortest round-trip digits, and a ≤9-sig-digit value
        // ≥ 1e-9 fits DECIMAL(30,18) exactly — so the accumulators are
        // bit-equal by construction
        // final 9-dp round: the engines' decimal→double conversions
        // differ by 1 ulp (correctly-rounded vs scaled multiply)
        round(sum(col("x").cast("string")
            .cast(org.apache.spark.sql.types.DecimalType(30, 18)))
          .cast("double") / count(lit(1)), 9).as("mean"))

  private val labelCentroidsSql =
    """SELECT label, CAST(dim - 1 AS INTEGER) AS dim, count(*) AS n,
      |  round(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(30,18))) AS DOUBLE)
      |    / count(*), 9) AS mean
      |FROM (SELECT label, unnest(embedding) AS x,
      |        generate_subscripts(embedding, 1) AS dim
      |      FROM embeddings)
      |GROUP BY 1, 2""".stripMargin

  /** Hard-negative mining for contrastive training: for each probe
    * vector, the top-k most-similar candidates with a DIFFERENT label
    * (similar-but-wrong examples — the negatives that actually teach).
    * Same scale skeleton as [[annCosineTopk]]: only the tiny probe set
    * broadcasts, the corpus never shuffles until the per-query top-k
    * window; the label-mismatch predicate rides the same codegen span
    * as the dot product. At production scale the probe side is a
    * bounded batch and the corpus side swaps in the LSH/IVF bucketed
    * candidate generation ([[annLshBucketed]]/[[annIvf]]).
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"),
        col("label"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("label").as("qlabel"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("nrm").as("cn"), col("label").as("clabel"))
    val sim = (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("qlabel") =!= col("clabel"))
      .select(col("query_id"), col("qlabel"), col("cand_id"),
        col("clabel"), sim)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
  }

  private val hardNegativesSql = {
    val dotQC = dotSql("qv", "cv")
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm, label
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, label AS qlabel
       |      FROM emb WHERE vec_id < 10),
       |c AS (SELECT vec_id AS cand_id, v AS cv, nrm AS cn, label AS clabel
       |      FROM emb),
       |scored AS (
       |  SELECT query_id, qlabel, cand_id, clabel, $dotQC / (qn * cn) AS cosine
       |  FROM c CROSS JOIN q WHERE qlabel != clabel)
       |SELECT query_id, qlabel, cand_id, clabel, cosine, rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, cand_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= 5""".stripMargin
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering THEN within-cluster pairwise cosine — the published
    * answer to "all-pairs near-dup doesn't scale": k-means partitions
    * the corpus so the quadratic step runs per cluster, candidates ∝
    * Σ|cluster|², never |corpus|². Within each cluster, any vector
    * whose cosine to a LOWER-id member is ≥ τ is dropped (keep-min —
    * deterministic, id-stable); survivors carry kept=true. τ = 0.4
    * here: the fixture's embeddings are near-isotropic (max pairwise
    * cosine ≈ 0.51), so the paper's ≥ 0.9 regime would never fire —
    * 0.4 exercises the drop path on 4–12%% of rows per SF; production
    * tunes τ against real embedding geometry.
    *
    * Assignment IS [[seedAssign]] — the same code object
    * [[kmeansAssign]] projects from (broadcast codebook,
    * ||v||²−2v·c+||c||² with sequential-fold bit parity), so the
    * argmin is engine-identical by construction, not by convention. The within-cluster self-join is
    * the identical subtree twice — SelfJoinShuffleRule pins it to a
    * shuffle-hash join computing that exchange once. The 8-seed
    * codebook here is the oracle-deterministic stand-in: production
    * runs [[kmeansIterate]] with k ≈ n/⟨cluster size⟩ so per-cluster
    * pair work stays bounded (the paper's regime — k in the tens of
    * thousands), and the pair explode inherits the min_k_distinct cap
    * discipline if a degenerate codebook ever funnels a corpus slice
    * into one cluster.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val assigned = seedAssign(spark, dir)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
    val a = assigned.select(col("cluster"), col("vec_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val dups = a.join(b, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .where(vec_dot(col("av"), col("bv")) / (col("an") * col("bn")) >= 0.4)
      .select(col("b_id").as("dup_id"))
      .distinct()
    // dup ids ∝ corpus size in production — never broadcast them; the
    // shuffle-hash pin also lets the left side reuse its vec_id
    // partitioning from the assignment window (no extra exchange)
    assigned
      .join(dups.hint("shuffle_hash"), col("vec_id") === col("dup_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("dup_id").isNull.as("kept"))
  }

  private val semDedupSql = {
    val dAB = dotSql("a.v", "b.v")
    s"""WITH $seedAssignSql,
       |dups AS (
       |  SELECT DISTINCT b.vec_id AS dup_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE $dAB / (a.nrm * b.nrm) >= 0.4)
       |SELECT a.vec_id, a.cluster, d.dup_id IS NULL AS kept
       |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.dup_id""".stripMargin
  }

  /** Retrieval-quality evaluation of the LSH candidate generator
    * against exact brute-force truth — the precision@k / MRR / nDCG@k
    * report every ANN deployment ships next to its index build: truth
    * = [[annCosineTopk]] (exact top-5), candidates =
    * [[annLshBucketed]] (bucketed top-3). A candidate is relevant iff
    * it appears in the query's exact top-5; nDCG uses binary gains at
    * the candidate's rank against the ideal (all-relevant) prefix.
    * precision@3 = hits/k (k = 3 retrieved); a recall would divide by
    * the 5-element relevance set instead — the column is named for
    * what it computes (r6 advice).
    *
    * Scale shape: both sides keep their own probe-broadcast plans; the
    * eval join is per-(query, candidate) — k×|queries| rows, driver-
    * trivial at any corpus size. The nDCG sum is order-free
    * ([[graft.functions.GraftFunctions.sum_order_free]]) and every
    * metric rounds to 9 dp, so the report compares bit-stable across
    * engines. Zero-candidate probes (alone in their sign bucket)
    * report explicit zeros rather than vanishing.
    */
  def annRankMetrics(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.sum_order_free
    val truth = annCosineTopk(spark, dir)
      .select(col("query_id"), col("cand_id"))
    val cand = annLshBucketed(spark, dir)
      .select(col("query_id"), col("cand_id"), col("rnk"))
    val ln2 = math.log(2.0)
    val k = 3
    val idealDcg = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / ln2)).sum
    // truth pairs are unique (row_number filter), so the direct left
    // join IS the relevance flag — no separate semi-join pass
    val scored = cand
      .join(truth.withColumn("rel", lit(1)), Seq("query_id", "cand_id"), "left")
      .select(col("query_id"), col("rnk"),
        coalesce(col("rel"), lit(0)).as("rel"))
      .groupBy(col("query_id"))
      .agg(
        round(sum(col("rel")).cast("double") / k, 9).as("precision_at_3"),
        round(coalesce(
          max(when(col("rel") === 1, lit(1.0) / col("rnk"))), lit(0.0)), 9)
          .as("mrr"),
        // order-free (sum_order_free): ndcg feeds a 9-dp round
        round(sum_order_free(col("rel") * (lit(1.0)
          / (log(col("rnk") + 1.0) / ln2))) / idealDcg, 9).as("ndcg_at_3"))
    // a probe alone in its sign bucket retrieves NOTHING — it must
    // still report 0s; those are exactly the worst queries this eval
    // exists to expose, not rows to drop
    truth.select(col("query_id")).distinct()
      .join(scored, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("precision_at_3"), lit(0.0)).as("precision_at_3"),
        coalesce(col("mrr"), lit(0.0)).as("mrr"),
        coalesce(col("ndcg_at_3"), lit(0.0)).as("ndcg_at_3"))
  }

  private val annRankMetricsSql = {
    val ln2 = math.log(2.0)
    val k = 3
    val idealDcg = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / ln2)).sum
    s"""WITH truth AS ($annCosineTopkSql),
       |cand AS ($annLshBucketedSql),
       |scored AS (
       |  SELECT c.query_id, c.rnk,
       |    CASE WHEN t.cand_id IS NULL THEN 0 ELSE 1 END AS rel
       |  FROM cand c LEFT JOIN truth t
       |    ON c.query_id = t.query_id AND c.cand_id = t.cand_id),
       |m AS (
       |  SELECT query_id,
       |    round(CAST(SUM(rel) AS DOUBLE) / $k, 9) AS precision_at_3,
       |    round(coalesce(MAX(CASE WHEN rel = 1 THEN 1.0 / rnk END), 0.0), 9) AS mrr,
       |    round(CAST(SUM(CAST(round(rel * (1.0 / (ln(rnk + 1.0) / $ln2)), 15) AS DECIMAL(28,15))) AS DOUBLE) / $idealDcg, 9) AS ndcg_at_3
       |  FROM scored GROUP BY 1)
       |SELECT q.query_id,
       |  coalesce(precision_at_3, 0.0) AS precision_at_3,
       |  coalesce(mrr, 0.0) AS mrr,
       |  coalesce(ndcg_at_3, 0.0) AS ndcg_at_3
       |FROM (SELECT DISTINCT query_id FROM truth) q
       |LEFT JOIN m ON q.query_id = m.query_id""".stripMargin
  }

  // ------------------------------------------------ product quantization

  private val PqM = 8 // subspaces of 64/8 = 8 dims each
  private val PqSub = 8

  /** IVF's storage-side twin: PRODUCT QUANTIZATION. Each vector is
    * compressed to [[PqM]] one-byte codes (nearest codeword per
    * 8-dim subspace); a query precomputes its per-(subspace, codeword)
    * distance table and scores any candidate with [[PqM]] table
    * lookups + adds (asymmetric distance computation, Jégou et al.
    * 2011) — never touching the raw floats. Together with [[annIvf]]
    * this is the IVF-PQ layout real 100 TB vector stores run.
    *
    * Codebook here = deterministic seed subvectors (vec_id 0/50/100/
    * 150), the same convention as [[annIvf]]'s coarse centroids; a
    * production pipeline would refine them with [[Clustering]]'s
    * k-means rounds — the assignment/ADC plumbing below is unchanged.
    *
    * Scale shape: the 32-row codebook and the 10-query × 32-entry
    * distance table BROADCAST; code assignment is one argmin over
    * n×[[PqM]]×4 locally-generated rows (windowed on (vec_id, m) —
    * full parallelism, key cardinality n×8); ADC is a broadcast join
    * + one map-side-combined (query, cand) sum. Nothing corpus-sized
    * shuffles except the n×8 code relation itself.
    */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // (k, m, cw): codeword k of subspace m
    val cb = e.where(col("vec_id") % 50 === 0 && col("vec_id") < 200)
      .select((col("vec_id") / 50).cast("int").as("k"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("v"))
      .select(col("k"), col("m"),
        slice(col("v"), col("m") * PqSub + 1, lit(PqSub)).as("cw"))
    def sub(v: Column, m: Column): Column = slice(v, m * PqSub + 1, lit(PqSub))
    // cast BEFORE subtracting: the raw arrays are float, and a float
    // subtraction would diverge from the oracle's double math
    def l2(a: Column, b: Column): Column = {
      val d = zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))
      vec_dot(d, d)
    }
    val wAssign = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist").asc, col("k").asc)
    val codes = e.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("m"), col("k"),
        l2(sub(col("v"), col("m")), col("cw")).as("dist"))
      .withColumn("rnk", row_number().over(wAssign))
      .where(col("rnk") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))
    val dtab = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cb))
      .select(col("query_id"), col("m"), col("k"),
        l2(sub(col("qv"), col("m")), col("cw")).as("qdist"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
    codes.join(broadcast(dtab),
        codes("m") === dtab("m") && codes("code") === dtab("k"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("cand_id"))
      .agg(round(sum_order_free(col("qdist")), 9).as("adc_dist"))
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= 3)
  }

  private val annPqSql = {
    def l2Sql(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]))), (acc, v) -> acc + v)"
    val subV = s"v[m * $PqSub + 1 : m * $PqSub + $PqSub]"
    val subQ = s"qv[m * $PqSub + 1 : m * $PqSub + $PqSub]"
    s"""WITH emb AS ($embSql),
       |cb AS (
       |  SELECT CAST(vec_id // 50 AS INTEGER) AS k, CAST(m AS INTEGER) AS m,
       |    $subV AS cw
       |  FROM emb, UNNEST(range(0, $PqM)) AS t(m)
       |  WHERE vec_id % 50 = 0 AND vec_id < 200),
       |codes AS (
       |  SELECT vec_id, m, k AS code FROM (
       |    SELECT e.vec_id, c.m, c.k,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.m
       |        ORDER BY ${l2Sql(subV.replace("v[", "e.v["), "c.cw")} ASC, c.k ASC)
       |        AS rnk
       |    FROM emb e CROSS JOIN cb c)
       |  WHERE rnk = 1),
       |dtab AS (
       |  SELECT q.vec_id AS query_id, c.m, c.k,
       |    ${l2Sql(subQ.replace("qv[", "q.v["), "c.cw")} AS qdist
       |  FROM emb q CROSS JOIN cb c
       |  WHERE q.vec_id < 10)
       |SELECT query_id, cand_id, adc_dist, rnk FROM (
       |  SELECT query_id, cand_id, adc_dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist ASC, cand_id ASC) AS rnk
       |  FROM (
       |    SELECT d.query_id, codes.vec_id AS cand_id,
       |      round(CAST(SUM(CAST(round(d.qdist, 15) AS DECIMAL(28,15)))
       |        AS DOUBLE), 9) AS adc_dist
       |    FROM codes JOIN dtab d ON codes.m = d.m AND codes.code = d.k
       |    WHERE d.query_id != codes.vec_id
       |    GROUP BY 1, 2))
       |WHERE rnk <= 3""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("ann_pq", annPq, Some(annPqSql)),
    Op("ann_rank_metrics", annRankMetrics, Some(annRankMetricsSql)),
    Op("sem_dedup", semDedup, Some(semDedupSql), bench = true),
    Op("hard_negatives", hardNegatives, Some(hardNegativesSql)),
    Op("knn_classify", knnClassify, Some(knnClassifySql)),
    Op("kmeans_assign", kmeansAssign, Some(kmeansAssignSql)),
    Op("label_centroids", labelCentroids, Some(labelCentroidsSql)),
    Op("centroid_confusion", centroidConfusion, Some(centroidConfusionSql)),
    Op("ann_cosine_topk", annCosineTopk, Some(annCosineTopkSql), bench = true),
    Op("ann_lsh_bucketed", annLshBucketed, Some(annLshBucketedSql)),
    Op("ann_ivf", annIvf, Some(annIvfSql)),
    Op("embedding_near_dup", embeddingNearDup, Some(embeddingNearDupSql)),
    Op("embedding_quantize", embeddingQuantize, Some(embeddingQuantizeSql)),
  )
}
