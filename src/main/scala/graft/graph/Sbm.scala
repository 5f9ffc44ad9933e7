package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stochastic block model network generation
  * (/root/reference/scripts/NetworkBuilder.py:423-480,
  * /root/reference/src/transforms/matrix_transforms.py:176-221:
  * nx.stochastic_block_model(sizes, probs, seed) + node re-tagging).
  *
  * Distributed design: candidate undirected pairs (i < j) are the
  * node×node upper triangle (a range-join over two node DataFrames);
  * each pair draws a deterministic uniform from xxhash64(i, j, seed) —
  * *partitioning-independent* seeded randomness, unlike rand(), which
  * depends on task layout — and keeps the edge when u < p(block_i,
  * block_j). Scales as |V|²/2 map-side work with no driver state;
  * block-pair probabilities are a broadcast dim.
  */
object Sbm {

  /** nodes: (node_id long, block string) built from per-block sizes —
    * contiguous id ranges per block, matching the reference's
    * node-ordering convention.
    */
  def nodes(spark: SparkSession, sizes: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    val offsets = sizes.scanLeft(0L)(_ + _._2)
    val ranges = sizes.zip(offsets).map { case ((b, n), off) => (b, off, off + n) }
    ranges.map { case (b, lo, hi) =>
      spark.range(lo, hi).select(col("id").as("node_id"), lit(b).as("block"))
    }.reduce(_ unionByName _)
  }

  /** Seeded SBM edges: upper-triangle pairs filtered by the block-pair
    * probability matrix (long form: block_a, block_b, prob).
    */
  def edges(spark: SparkSession, nodesDf: DataFrame, probs: DataFrame,
      seed: Long): DataFrame = {
    val a = nodesDf.select(col("node_id").as("src"), col("block").as("block_a"))
    val b = nodesDf.select(col("node_id").as("dst"), col("block").as("block_b"))
    // deterministic per-pair uniform in [0, 1): bottom 52 bits of the
    // pair hash scaled by 2^-52
    val u = (pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(1L << 52))
      .cast("double") / lit((1L << 52).toDouble))
    a.crossJoin(b)
      .where(col("src") < col("dst"))
      .join(broadcast(probs), Seq("block_a", "block_b"))
      .where(u < col("prob"))
      .select(col("src"), col("dst"), col("block_a"), col("block_b"))
  }

  /** Full pipeline: sizes + probability matrix → tagged vertex/edge
    * DataFrames ready for the GraphML sink.
    */
  def generate(spark: SparkSession, sizes: Seq[(String, Long)],
      probs: DataFrame, seed: Long): (DataFrame, DataFrame) = {
    val n = nodes(spark, sizes)
    val e = edges(spark, n, probs, seed)
    val vertices = n.select(col("node_id").cast("string").as("node_id"),
      map(lit("block"), col("block")).as("attrs"))
    val edgesOut = e.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    (vertices, edgesOut)
  }
}
