package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r19, TODO carry-over): `graph_jaccard_links` was the
  * slowest ≈sf1 sweep query at 346 s — this harness decomposes the
  * query into stages and A/Bs the wedge-enumeration spelling,
  * interleaved in ONE session (between-JVM noise ±30% ≫ effect; the
  * DevAbPcy discipline).
  *
  * Stages: edges (the co-location distinct), adjacency+degree, wedge
  * pair counting (`common`), then the full query (anti-join + two
  * degree joins + projection).
  *
  * Wedge spellings (identical (node_a, node_b, cn) output,
  * checksum-verified):
  *  - joinshape — registered r?: adjacency self-joined on the shared
  *                neighbor (shuffle-hash), a<b filter, hash agg.
  *                Streams deg² wedge rows; two exchanges of adj.
  *  - structs   — groupBy(nbr) → sort_array(collect_list(node)) →
  *                explode(pair_structs) → hash agg. ONE exchange of
  *                adj, emits exactly d(d-1)/2 canonical pairs per
  *                neighbor with no join hash table; the per-group
  *                buffer is degree-bounded (printed below).
  *
  * Usage: runMain graft.DevJacAb [sfDir] [reps]
  */
object DevJacAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val runs = sys.env.getOrElse("GRAFT_RUNS", "3").toInt
    val spark = Sessions.build("graft-ab-jaccard",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (reps <= 1) sfDir
              else DevScaleProbe.ensureReplicated(spark, sfDir, reps)

    def edges = graft.operators.Interactions.empiricEdges(spark, dir)
    def adj = {
      val e = edges
      e.select(col("src").as("node"), col("dst").as("nbr"))
        .unionByName(e.select(col("dst").as("node"), col("src").as("nbr")))
    }

    def commonJoin: DataFrame = {
      val a = adj
      a.select(col("node").as("node_a"), col("nbr"))
        .hint("shuffle_hash")
        .join(a.select(col("node").as("node_b"), col("nbr")), Seq("nbr"))
        .where(col("node_a") < col("node_b"))
        .groupBy(col("node_a"), col("node_b"))
        .agg(count(lit(1)).as("cn"))
    }

    def commonStructs: DataFrame = adj
      .groupBy(col("nbr"))
      .agg(sort_array(collect_list(col("node"))).as("nodes"))
      .select(explode(call_function("pair_structs", col("nodes"))).as("p"))
      .groupBy(col("p.ia").as("node_a"), col("p.ib").as("node_b"))
      .agg(count(lit(1)).as("cn"))

    // dense-encode nodes over the device-bounded catalog, pack the
    // pair into ONE long (da<<32|db) inside the wedge join's
    // projection, count the single-long key, decode after — halves
    // the agg key width and lets codegen use the fast long-key map
    def commonPacked: DataFrame = {
      val a = adj
      val idmap = a.select(col("node")).distinct()
        .withColumn("nid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("node"))))
      val enc = a.join(broadcast(idmap), Seq("node"))
        .select(col("nid"), col("nbr"))
      val packed = enc.select(col("nid").as("na"), col("nbr"))
        .hint("shuffle_hash")
        .join(enc.select(col("nid").as("nb"), col("nbr")), Seq("nbr"))
        .where(col("na") < col("nb"))
        .select((shiftleft(col("na").cast("long"), 32)
          .bitwiseOR(col("nb").cast("long"))).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("cn"))
      packed
        .select(shiftright(col("pk"), 32).cast("int").as("na"),
          col("pk").bitwiseAND(lit(0xffffffffL)).cast("int").as("nb"),
          col("cn"))
        .join(broadcast(idmap.select(col("nid").as("na"), col("node").as("node_a"))), Seq("na"))
        .join(broadcast(idmap.select(col("nid").as("nb"), col("node").as("node_b"))), Seq("nb"))
        .select(col("node_a"), col("node_b"), col("cn"))
    }

    def full(common: DataFrame): DataFrame = {
      val e = edges
      val a = adj
      val deg = a.groupBy(col("node")).agg(count(lit(1)).as("d"))
      common
        .join(e.hint("shuffle_hash"),
          common("node_a") === e("src") && common("node_b") === e("dst"),
          "left_anti")
        .join(deg.select(col("node").as("node_a"), col("d").as("da"))
          .hint("shuffle_hash"), Seq("node_a"))
        .join(deg.select(col("node").as("node_b"), col("d").as("db"))
          .hint("shuffle_hash"), Seq("node_b"))
        .select(col("node_a"), col("node_b"), col("cn"),
          round(col("cn").cast("double") / (col("da") + col("db") - col("cn")), 9)
            .as("jaccard"))
    }

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- stage profile (once, warm-ish after a first edges pass) ----
    edges.count()
    val ne = time("edges.count")(edges.count())
    println(s"        |edges| = $ne")
    val stats = time("degree stats")(
      adj.groupBy(col("node")).agg(count(lit(1)).as("d"))
        .agg(max(col("d")).as("dmax"), avg(col("d")).as("davg"),
          sum(col("d") * (col("d") - 1) / 2).as("wedges"))
        .collect()(0))
    println(s"        dmax=${stats.get(0)} davg=${stats.get(1)} wedges=${stats.get(2)}")

    // checksum equality of the wedge spellings (skippable at big reps
    // where the sig agg itself costs a full pass per variant)
    if (sys.env.getOrElse("GRAFT_CHECK", "1") == "1") {
      def sig(df: DataFrame) = df
        .agg(count(lit(1)), sum(col("cn")),
          sum(col("node_a") * col("cn") + col("node_b"))).collect()(0).toString
      val sa = time("sig(joinshape)")(sig(commonJoin))
      val sb = time("sig(structs)")(sig(commonStructs))
      val sc = time("sig(packed)")(sig(commonPacked))
      println(s"        joinshape=$sa structs=$sb packed=$sc " +
        s"equal=${sa == sb && sb == sc}")
    }

    // ---- interleaved A/B (variants alternate within each round so a
    // machine-load drift hits all spellings equally), min-of-runs ----
    val all = Seq(
      "common/joinshape" -> (() => commonJoin),
      "common/structs" -> (() => commonStructs),
      "common/packed" -> (() => commonPacked),
      "full/joinshape" -> (() => full(commonJoin)),
      "full/structs" -> (() => full(commonStructs)))
    val sel = sys.env.get("GRAFT_VARIANTS").map(_.split(",").toSet)
    val variants = sel.fold(all)(s => all.filter(v => s.contains(v._1)))
    variants.foreach { case (_, mk) => mk().count() } // warm all
    val t = (1 to runs).map { _ =>
      variants.map { case (n, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        n -> (System.nanoTime() - t0) / 1e9
      }
    }
    variants.map(_._1).foreach { n =>
      val ts = t.map(_.find(_._1 == n).get._2)
      println(f"[ab] $n%-22s min=${ts.min}%.2f " +
        f"raw=[${ts.map(x => f"$x%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
