package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Similarity search over the embeddings table (Array[Float], dim 64).
  *
  * Baseline: brute-force cosine top-k (query set × corpus). Scale path:
  * sign-LSH bucketing — hyperplane sign bits bound each probe to one
  * bucket, so the join is equi on the bucket key instead of a full
  * cross product.
  *
  * Float-parity policy: elements are cast float→double (exact) before
  * any arithmetic; the dot product folds sequentially in index order
  * (functions.aggregate ≡ DuckDB list_reduce fold), so both engines do
  * the identical IEEE double operation sequence — results compare
  * bit-for-bit, no rounding needed.
  */
object Similarity {

  /** embedding as Array[Double] column. */
  private val vec: Column = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
  private val vecSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  /** Sequential-order dot product of two equal-length double arrays. */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (acc, v) -> acc + v)"

  /** Brute-force cosine top-k: query set = vec_id < 10, corpus =
    * everything else; rank by cosine desc with vec_id tie-break.
    * Query side is tiny => broadcast; corpus side never shuffles until
    * the per-query top-k (window keyed on query_id).
    */
  def annCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vec.as("v"),
        sqrt(dot("transform(embedding, x -> CAST(x AS DOUBLE))",
          "transform(embedding, x -> CAST(x AS DOUBLE))")).as("nrm"))
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val sim = (dot("qv", "cv") / (col("qn") * col("cn"))).as("cosine")
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
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings),
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

  /** Sign-LSH bucketed ANN (the 100 TB path): bucket key = sign bits of
    * 4 fixed coordinate hyperplanes; candidates are joined only within
    * the probe's bucket, then ranked. Recall < 1 by construction —
    * that's the LSH trade — but the bucket join replaces the cross
    * product with an equi-join.
    */
  def annLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (0 until 4)
      .map(i => when(element_at(col("v"), i * 16 + 1) >= 0, lit(1)).otherwise(lit(0))
        * lit(1 << i))
      .reduce((a: Column, b: Column) => a + b)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vec.as("v"),
        sqrt(dot("transform(embedding, x -> CAST(x AS DOUBLE))",
          "transform(embedding, x -> CAST(x AS DOUBLE))")).as("nrm"))
      .withColumn("bucket", bucket)
    val q = emb.where(col("vec_id") < 10)
      .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val sim = (dot("qv", "cv") / (col("qn") * col("cn"))).as("cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    emb.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), sim)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
  }

  private val annLshBucketedSql = {
    val bucketSql = (0 until 4)
      .map(i => s"(CASE WHEN v[${i * 16 + 1}] >= 0 THEN 1 ELSE 0 END) * ${1 << i}")
      .mkString(" + ")
    val dotQC = dotSql("qv", "cv")
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings),
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

  /** Embedding-cosine near-duplicate pairs (dedup by vector proximity):
    * all pairs with cosine >= 0.8, canonical a<b ordering.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vec.as("v"),
        sqrt(dot("transform(embedding, x -> CAST(x AS DOUBLE))",
          "transform(embedding, x -> CAST(x AS DOUBLE))")).as("nrm"))
    val a = emb.select(col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an"))
    val b = emb.select(col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"))
    a.crossJoin(b)
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot("av", "bv") / (col("an") * col("bn"))).as("cosine"))
      .where(col("cosine") >= 0.8)
  }

  private val embeddingNearDupSql = {
    val dotAB = dotSql("av", "bv")
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings),
       |a AS (SELECT vec_id AS a_id, v AS av, nrm AS an FROM emb),
       |b AS (SELECT vec_id AS b_id, v AS bv, nrm AS bn FROM emb)
       |SELECT a_id, b_id, $dotAB / (an * bn) AS cosine
       |FROM a CROSS JOIN b
       |WHERE a_id < b_id AND $dotAB / (an * bn) >= 0.8""".stripMargin
  }

  /** IVF-style ANN (the other classic scale path): a deterministic
    * coarse codebook (every 50th vector), each corpus vector assigned
    * to its nearest centroid (the "inverted list" key), probes search
    * only their centroid's list. At 100 TB the assignment is one
    * broadcast-join pass and each probe touches |corpus|/nlist rows.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vec.as("v"),
        sqrt(dot("transform(embedding, x -> CAST(x AS DOUBLE))",
          "transform(embedding, x -> CAST(x AS DOUBLE))")).as("nrm"))
    val centroids = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val csim = (dot("v", "cv") / (col("nrm") * col("cn")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(csim.desc, col("c_id").asc)
    val assigned = emb.crossJoin(broadcast(centroids))
      .withColumn("rnk", row_number().over(wAssign))
      .where(col("rnk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("list_id"))
    val probes = assigned.where(col("vec_id") < 10)
      .select(col("list_id"), col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val sim = (dot("qv", "cv2") / (col("qn") * col("cn2"))).as("cosine")
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
    s"""WITH emb AS (
       |  SELECT vec_id, $vecSql AS v,
       |    sqrt(${dotSql(vecSql, vecSql)}) AS nrm
       |  FROM embeddings),
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

  val ops: Seq[Op] = Seq(
    Op("ann_cosine_topk", annCosineTopk, Some(annCosineTopkSql), bench = true),
    Op("ann_lsh_bucketed", annLshBucketed, Some(annLshBucketedSql)),
    Op("ann_ivf", annIvf, Some(annIvfSql)),
    Op("embedding_near_dup", embeddingNearDup, Some(embeddingNearDupSql)),
  )
}
