package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Gillespie SEIR simulation over a contact network
  * (/root/reference/scripts/SimulationManager.py:89-241,
  * /root/reference/src/utils/seir_utils.py:20-143: EoN
  * Gillespie_simple_contagion with E→I rate sigma, I→R rate gamma,
  * transmission rate beta).
  *
  * A single epidemic trajectory is inherently sequential, so one run
  * executes on one core over the (scaled, ≤10⁴-node) network — exactly
  * the reference's per-process design — and the 100-seeds-per-network
  * fan-out distributes as one Spark task per seed with the adjacency
  * broadcast (mirrors mp.Pool(10) at SimulationManager.py:371-372).
  */
object Seir {

  /** Per-node status-entry times (NaN = never), matching the
    * reference's node_status CSV shape
    * (/root/reference/scripts/csv_infected.py:69-84).
    */
  final case class NodeStatus(seed: Long, nodeId: Long, tE: Double, tI: Double, tR: Double)

  /** One Gillespie SEIR trajectory. Events: S→E (rate beta per SI
    * edge), E→I (sigma), I→R (gamma). Seeded and reproducible.
    */
  def run(adj: Map[Long, Array[Long]], beta: Double, sigma: Double,
      gamma: Double, initialInfected: Seq[Long], tmax: Double,
      seed: Long): Seq[NodeStatus] = {
    val rnd = new java.util.Random(seed)
    val S = 0; val E = 1; val I = 2; val R = 3
    val state = mutable.Map.empty[Long, Int].withDefaultValue(S)
    val tE = mutable.Map.empty[Long, Double]
    val tI = mutable.Map.empty[Long, Double]
    val tR = mutable.Map.empty[Long, Double]
    val exposed = mutable.Set.empty[Long]
    val infected = mutable.Set.empty[Long]
    initialInfected.foreach { n =>
      state(n) = I; tI(n) = 0.0; infected += n
    }
    var t = 0.0
    while (t < tmax && (infected.nonEmpty || exposed.nonEmpty)) {
      // rates
      val siEdges = infected.toSeq.sorted.flatMap { i =>
        adj.getOrElse(i, Array.empty[Long]).filter(state(_) == S).map(s => (i, s))
      }
      val rateInfect = beta * siEdges.size
      val rateProgress = sigma * exposed.size
      val rateRecover = gamma * infected.size
      val total = rateInfect + rateProgress + rateRecover
      if (total <= 0) return result(adj, tE, tI, tR, seed)
      t += -math.log(1.0 - rnd.nextDouble()) / total
      if (t >= tmax) return result(adj, tE, tI, tR, seed)
      val u = rnd.nextDouble() * total
      if (u < rateInfect) {
        val (_, s) = siEdges(rnd.nextInt(siEdges.size))
        state(s) = E; tE(s) = t; exposed += s
      } else if (u < rateInfect + rateProgress) {
        val picks = exposed.toSeq.sorted
        val n = picks(rnd.nextInt(picks.size))
        state(n) = I; tI(n) = t; exposed -= n; infected += n
      } else {
        val picks = infected.toSeq.sorted
        val n = picks(rnd.nextInt(picks.size))
        state(n) = R; tR(n) = t; infected -= n
      }
    }
    result(adj, tE, tI, tR, seed)
  }

  private def result(adj: Map[Long, Array[Long]],
      tE: mutable.Map[Long, Double], tI: mutable.Map[Long, Double],
      tR: mutable.Map[Long, Double], seed: Long): Seq[NodeStatus] = {
    val nodes = (adj.keySet ++ adj.values.flatten).toSeq.sorted
    nodes.map(n => NodeStatus(seed, n,
      tE.getOrElse(n, Double.NaN), tI.getOrElse(n, Double.NaN),
      tR.getOrElse(n, Double.NaN)))
  }

  /** Seed fan-out as a Spark job: one task per seed, adjacency
    * broadcast (the distributed analog of the reference's process
    * pool).
    */
  def runMany(spark: SparkSession, adj: Map[Long, Array[Long]],
      beta: Double, sigma: Double, gamma: Double,
      initialInfected: Seq[Long], tmax: Double, seeds: Range): DataFrame = {
    import spark.implicits._
    val bAdj = spark.sparkContext.broadcast(adj)
    val bInit = spark.sparkContext.broadcast(initialInfected)
    spark.createDataset(seeds.toSeq)
      .repartition(math.min(seeds.size, 32))
      .flatMap(s => run(bAdj.value, beta, sigma, gamma, bInit.value, tmax, s.toLong))
      .toDF()
  }

  /** Post-simulation analytics: infected count per block
    * (/root/reference/scripts/csv_infected.py:62-133) — join node
    * status with the node→block catalog, count nodes that ever entered
    * I, per (seed, block).
    */
  def infectedPerBlock(status: DataFrame, nodeBlocks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    status.join(nodeBlocks, Seq("nodeId"))
      .where(!isnan(col("tI")))
      .groupBy(col("seed"), col("block"))
      .agg(countDistinct(col("nodeId")).as("n_infected"))
  }
}
