package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r11): paired same-session A/Bs for the r11 optimization
  * targets — old vs new spelling timed back-to-back under the noop
  * sink, min-of-N, so window weather cancels.
  *
  * Usage: runMain graft.DevR11Ab [sfDir] [runs] [group ...]
  * Groups: chooser pack cf mb sparse setsim
  */
object DevR11Ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val (runs, groups0) =
      if (rest.nonEmpty && rest(0).forall(_.isDigit)) (rest(0).toInt, rest.tail.toSet)
      else (5, rest.toSet)
    val groups = if (groups0.isEmpty)
      Set("chooser", "pack", "cf", "mb", "sparse", "setsim") else groups0
    val spark = Sessions.build("graft-r11-ab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    def cfSets = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .groupBy(col("u"))
      .agg(call_function("min_k_distinct", col("i"), lit(61)).as("items"))
      .where(size(col("items")) <= 60)

    def itemCosineWith(pack: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sets = cfSets
      val itemCnt = sets.select(explode(col("items")).as("i"))
        .groupBy(col("i")).agg(count(lit(1)).as("cnt"))
      val co = operators.Recommend.pairCounts(sets, minCount = 4, packU32 = pack)
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

    def sparseWith(kernel: Boolean): DataFrame = {
      import graft.functions.GraftFunctions.gram_tf
      val postings = Tables.documents(spark, dir)
        .select(col("doc_id"), gram_tf(col("text"), lit(3)).as("gt"))
        .select(col("doc_id"), col("gt.n2").as("n2"),
          explode(col("gt.tfs")).as("e"))
        .groupBy(col("e.g"))
        .agg(call_function("capped_collect",
          struct(col("doc_id"), col("e.tf").as("tf"), col("n2")), lit(50))
          .as("ps"))
        .where(size(col("ps")) <= 50)
      val pairs =
        if (kernel) postings
          .select(explode(call_function("posting_pairs", col("ps"))).as("pr"))
          .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"),
            col("pr.p").as("p"), col("pr.na2").as("na2"), col("pr.nb2").as("nb2"))
        else postings
          .select(explode(col("ps")).as("a"), col("ps"))
          .select(col("a"), explode(col("ps")).as("b"))
          .where(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            (col("a.tf") * col("b.tf")).as("p"),
            col("a.n2").as("na2"), col("b.n2").as("nb2"))
      pairs
        .groupBy(col("doc_a"), col("doc_b"), col("na2"), col("nb2"))
        .agg(sum(col("p")).as("dot"))
        .select(col("doc_a"), col("doc_b"), col("dot"),
          round(col("dot").cast("double")
            / sqrt(col("na2").cast("double") * col("nb2").cast("double")), 9)
            .as("cosine"))
        .where(col("cosine") >= 0.05)
    }

    def setSimWith(rep: Boolean, rebalance: Boolean = false): DataFrame = {
      import graft.functions.GraftFunctions.shingle_hash_set
      val tok = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(shingle_hash_set(col("text"))).as("token"))
      val df = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ds0 = tok.join(df.hint("shuffle_hash"), "token")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("ord"))
        .select(col("doc_id"),
          expr("transform(ord, s -> s.token)").as("toks"),
          size(col("ord")).cast("long").as("sz"))
      val docsets =
        if (rebalance) ds0.hint("rebalance", col("doc_id"))
        else if (rep) ds0.repartition(col("doc_id"))
        else ds0
      val prefix = docsets
        .select(col("doc_id"), col("sz"),
          explode(expr("slice(toks, 1, CAST(sz - ((3 * sz + 4) DIV 5) + 1 AS INT))"))
            .as("ptok"))
      val pa = prefix.alias("pa").hint("shuffle_hash")
      val pb = prefix.alias("pb")
      val cand = pa.join(pb,
          col("pa.ptok") === col("pb.ptok")
            && col("pa.doc_id") < col("pb.doc_id")
            && lit(5) * least(col("pa.sz"), col("pb.sz"))
               >= lit(3) * greatest(col("pa.sz"), col("pb.sz")))
        .groupBy(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared_prefix"))
      val da = docsets.alias("da")
      val db = docsets.alias("db")
      cand.hint("shuffle_hash").join(da, col("doc_a") === col("da.doc_id"))
        .hint("shuffle_hash").join(db, col("doc_b") === col("db.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("da.toks"), col("db.toks"))).cast("long")
            .as("n_inter"),
          col("da.sz").as("sz_a"), col("db.sz").as("sz_b"))
        .where(lit(5) * col("n_inter")
          >= lit(3) * (col("sz_a") + col("sz_b") - col("n_inter")))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          (col("n_inter").cast("double")
            / (col("sz_a") + col("sz_b") - col("n_inter"))).as("jaccard"))
    }

    def mbWith(pack: Boolean): DataFrame = {
      val sets = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .groupBy(col("okey"))
        .agg(call_function("min_k_distinct", col("item"), lit(1025)).as("items"))
        .where(size(col("items")) <= 1024)
      val itemCnt = sets.select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      val nOrders = sets.agg(count(lit(1)).as("n"))
      val half = operators.Recommend.pairCounts(sets, minCount = 2, packU32 = pack)
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

    val variants: Seq[(String, String, () => DataFrame)] = Seq(
      ("pack", "pairs_struct", () => operators.Recommend.pairCounts(cfSets, 4)),
      ("pack", "pairs_packed", () =>
        operators.Recommend.pairCounts(cfSets, 4, packU32 = true)),
      ("cf", "cf_old", () => itemCosineWith(pack = false)),
      ("cf", "cf_packed", () => itemCosineWith(pack = true)),
      ("mb", "mb_old", () => mbWith(pack = false)),
      ("mb", "mb_packed", () => mbWith(pack = true)),
      ("sparse", "sparse_old", () => sparseWith(kernel = false)),
      ("sparse", "sparse_kernel", () => sparseWith(kernel = true)),
      ("setsim", "setsim_old", () => setSimWith(rep = false)),
      ("setsim", "setsim_rep", () => setSimWith(rep = true)),
      ("setsim", "setsim_rebal", () => setSimWith(rep = false, rebalance = true)),
    ).filter(v => groups(v._1))

    if (groups("chooser")) {
      // chooser-job cost alone (min/max over one lineitem column)
      (1 to 3).foreach(_ => operators.Recommend.itemIdsPackU32(spark, dir))
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        operators.Recommend.itemIdsPackU32(spark, dir)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r11-ab] chooser_job min=${ts.min}%.3f raw=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
    }

    variants.foreach { case (_, n, f) =>
      f().write.format("noop").mode("overwrite").save() } // warm
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (_, label, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      best(label) = math.min(dt, best.getOrElse(label, Double.MaxValue))
      println(f"[r11-ab] $label%-16s $dt%.3f s")
    }
    variants.foreach { case (_, l, _) =>
      println(f"BEST $l%-16s ${best(l)}%.3f s") }
    spark.stop()
  }
}
