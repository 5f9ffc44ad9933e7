package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks / running sums WITHOUT a single-partition window.
  *
  * The naive spelling of `ntile`, `row_number() OVER (ORDER BY …)`, or a
  * global cumulative sum plans as `Exchange SinglePartition` + one sorted
  * window task over the whole relation — the classic scale-killer
  * (VERDICT r5 #2/#3). This helper computes the same EXACT answer as the
  * global window through the distributed two-pass shape:
  *
  *   1. sample ~`buckets` approximate quantile cutoffs of the sort key
  *      (one cheap pass; driver gets `buckets-1` doubles — a bounded
  *      collect, same class as length_trim's broadcast bounds);
  *   2. assign each row a RANGE bucket by comparing its key against the
  *      broadcast cutoffs — a pure map, no exchange. Bucket boundaries
  *      only affect BALANCE, never the answer: any monotone bucketing
  *      that keeps ties together yields the same global order, so the
  *      approximation in step 1 is free of correctness risk (and so is
  *      its run-to-run merge-order nondeterminism);
  *   3. per-bucket totals (≤ `buckets` rows) cumsum on a bounded window
  *      and broadcast back as offsets;
  *   4. the running aggregate inside each bucket is an ordinary
  *      partitioned window; offset + in-bucket running value = the exact
  *      global running value.
  *
  * Nothing corpus-sized ever single-partitions and no stage depends on
  * physical partition ids (a `spark_partition_id`-based spelling would
  * break under AQE's per-consumer coalescing of a reused exchange — the
  * bucket here is derived from the DATA, so every branch agrees on it).
  *
  * Skew caveat: one pathologically hot key value lands in one bucket
  * (ties must stay together). That bucket degrades to the relation's
  * tie-group size — strictly better than the global window it replaces,
  * which degrades to the WHOLE relation.
  */
object RangeRank {

  /** `df` + column `out` = exact running sum of `value` in
    * (`keyName` DESC NULLS LAST, `tieName` ASC) order, inclusive of the
    * current row. `totalOut`, when set, adds the grand total of `value`
    * as a column (from the same bounded offsets relation — no extra
    * corpus pass).
    */
  def withRunningDesc(df: DataFrame, keyName: String, tieName: String,
      value: Column, out: String, buckets: Int = 64,
      totalOut: Option[String] = None,
      sampleOn: Option[DataFrame] = None,
      cuts: Option[Array[Double]] = None): DataFrame = {
    require(buckets >= 2, s"RangeRank: need >= 2 buckets, got $buckets")
    val b = s"__rr_b_$out"
    val v = s"__rr_v_$out"
    // the cutoff sampling is an EAGER approxQuantile action over
    // `sampleOn` (default: df itself). A caller stacking several
    // RangeRank passes must sample each from the shared BASE relation,
    // not the previous pass's output — otherwise pass k's action
    // re-executes passes 1..k-1's windows and joins just to sample an
    // unchanged column (the rfm_segments lesson) — or pre-sample every
    // key in ONE action via [[sampleCuts]] and pass `cuts`. Correctness
    // never depends on the choice: cutoffs only steer bucket BALANCE.
    val keyed = df.withColumn(v, value)
      .withColumn(b, bucketFromCuts(keyName,
        cuts.getOrElse(sampleCutsOne(sampleOn.getOrElse(df), keyName, buckets))))
    var offs = keyed.groupBy(col(b)).agg(sum(col(v)).as("__rr_bt"))
      .withColumn("__rr_off", coalesce(
        sum(col("__rr_bt")).over(Window.orderBy(col(b).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    offs = totalOut match {
      case Some(t) => offs.withColumn(t,
        sum(col("__rr_bt")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col(b), col("__rr_off"), col(t))
      case None => offs.select(col(b), col("__rr_off"))
    }
    keyed.join(broadcast(offs), Seq(b))
      .withColumn(out, col("__rr_off") + sum(col(v)).over(
        Window.partitionBy(col(b))
          .orderBy(col(keyName).desc, col(tieName).asc)
          // explicit ROWS frame: the default RANGE frame would lump
          // order-peers, silently breaking rank semantics if a caller
          // ever passes a non-tie-free ordering
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(b, v, "__rr_off")
  }

  /** `df` + column `out` = exact global rank (1-based, `row_number`
    * semantics — the (`keyName`, `tieName`) order must be tie-free) in
    * (`keyName` DESC NULLS LAST, `tieName` ASC) order.
    */
  def withRankDesc(df: DataFrame, keyName: String, tieName: String,
      out: String, buckets: Int = 64,
      totalOut: Option[String] = None,
      sampleOn: Option[DataFrame] = None,
      cuts: Option[Array[Double]] = None): DataFrame =
    withRunningDesc(df, keyName, tieName, lit(1L), out, buckets, totalOut,
      sampleOn, cuts)

  /** Exact `ntile(k)` value from a global rank and the relation total —
    * SQL-standard semantics: the first `total mod k` tiles get
    * `floor(total/k)+1` rows, the rest `floor(total/k)`. Integer-exact
    * via the multiple-trick floor-div (`(a - a mod b) / b` divides an
    * exact multiple, so the double division is exact for all longs).
    */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    def floorDiv(a: Column, bc: Column): Column =
      ((a - pmod(a, bc)) / bc).cast("long")
    val base = floorDiv(total, lit(k.toLong))
    val rem = pmod(total, lit(k.toLong))
    val cut = (base + lit(1L)) * rem
    when(rank <= cut, floorDiv(rank + base, base + lit(1L)))
      .otherwise(rem + floorDiv(rank - cut + base - lit(1L),
        greatest(base, lit(1L))))
      .cast("int")
  }

  /** Per-GROUP exact ascending rank (`row_number` semantics over
    * `keyName ASC, ties...` within each `partKeys` group) WITHOUT the
    * per-group corpus sort. The naive
    * `row_number/ntile OVER (PARTITION BY g ORDER BY k)` bounds
    * parallelism by |groups| — 3 return flags sort the whole fact
    * table on 3 tasks (VERDICT r6 #2/#3). Here the key is range-
    * bucketed by GLOBALLY sampled cutoffs (balance only, never
    * correctness), per-(group, bucket) counts cumsum on the bounded
    * offsets relation (|groups| × buckets rows), and the in-bucket
    * window partitions by (group, bucket) — parallelism |groups| ×
    * buckets. `totalOut` adds the per-GROUP row total.
    *
    * Contract: |groups| must be bounded (the offsets relation is
    * broadcast); `ties` must make the in-group order tie-free.
    */
  def withRankAscGrouped(df: DataFrame, partKeys: Seq[String],
      keyName: String, ties: Seq[Column], out: String, buckets: Int = 64,
      totalOut: Option[String] = None,
      cuts: Option[Array[Double]] = None): DataFrame = {
    require(partKeys.nonEmpty, "withRankAscGrouped: need >= 1 group key")
    val b = s"__rr_b_$out"
    val keyed = df.withColumn(b, bucketFromCutsAsc(keyName,
      cuts.getOrElse(sampleCutsOne(df, keyName, buckets))))
    val gb = (partKeys :+ b).map(col)
    var offs = keyed.groupBy(gb: _*).agg(count(lit(1)).as("__rr_bt"))
      .withColumn("__rr_off", coalesce(
        sum(col("__rr_bt")).over(
          Window.partitionBy(partKeys.map(col): _*).orderBy(col(b).asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    offs = totalOut match {
      case Some(t) => offs.withColumn(t,
        sum(col("__rr_bt")).over(Window.partitionBy(partKeys.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(gb :+ col("__rr_off") :+ col(t): _*)
      case None => offs.select(gb :+ col("__rr_off"): _*)
    }
    keyed.join(broadcast(offs), partKeys :+ b)
      .withColumn(out, col("__rr_off") + row_number().over(
        Window.partitionBy(gb: _*)
          .orderBy(col(keyName).asc_nulls_last +: ties: _*)).cast("long"))
      .drop(b, "__rr_off")
  }

  /** Exact GLOBAL rank over (`majorName` DESC, `keyName` ASC) when the
    * major key is massively tied but bounded-cardinality (a term
    * frequency, a small score) and the minor key is unique (a doc id).
    * Single-key RangeRank can't cut this — ties must share a bucket,
    * so the hot major value IS the corpus (the rrf_fusion shape).
    * Here the bucket is the PAIR (major, sampled-cut bucket of key):
    * per-pair counts cumsum in (major DESC, bucket ASC) order over the
    * bounded offsets relation (|distinct major| × buckets rows), and
    * the in-bucket window partitions by the pair. Nothing corpus-sized
    * single-partitions even when every major value ties.
    *
    * Contract: |distinct majorName| bounded (offsets broadcast);
    * `keyName` unique and non-null; `majorName` non-null.
    */
  def withRankMajorDesc(df: DataFrame, majorName: String, keyName: String,
      out: String, buckets: Int = 64,
      cuts: Option[Array[Double]] = None): DataFrame = {
    val b = s"__rr_b_$out"
    val keyed = df.withColumn(b, bucketFromCutsAsc(keyName,
      cuts.getOrElse(sampleCutsOne(df, keyName, buckets))))
    val offs = keyed.groupBy(col(majorName), col(b))
      .agg(count(lit(1)).as("__rr_bt"))
      .withColumn("__rr_off", coalesce(
        sum(col("__rr_bt")).over(
          Window.orderBy(col(majorName).desc, col(b).asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(majorName), col(b), col("__rr_off"))
    keyed.join(broadcast(offs), Seq(majorName, b))
      .withColumn(out, col("__rr_off") + row_number().over(
        Window.partitionBy(col(majorName), col(b))
          .orderBy(col(keyName).asc)).cast("long"))
      .drop(b, "__rr_off")
  }

  /** Per-GROUP exact rank under a COMPOSITE ordering (bounded-domain
    * major keys first, then a unique numeric minor key) — the grouped
    * generalization of [[withRankMajorDesc]]: bucket = (group, majors,
    * sampled minor-key bucket); per-bucket counts cumsum per group in
    * (majorOrder, bucket ASC) order over the bounded offsets relation
    * (|groups| × |major domain| × buckets rows); the in-bucket window
    * partitions by the full composite. Handles mixed sort directions
    * and NULLS LAST via caller-materialized major columns (encode a
    * nullable sort key as (isnull, coalesce(key, sentinel)) — both
    * non-null — so the offsets broadcast join stays null-safe).
    *
    * Contract: `majorNames` are NON-NULL bounded-domain columns,
    * `majorOrder` sorts exactly those columns, `keyName` is unique and
    * non-null within (group, majors).
    */
  def withRankGroupedMajor(df: DataFrame, partKeys: Seq[String],
      majorNames: Seq[String], majorOrder: Seq[Column], keyName: String,
      out: String, buckets: Int = 64,
      cuts: Option[Array[Double]] = None): DataFrame = {
    val b = s"__rr_b_$out"
    val keyed = df.withColumn(b, bucketFromCutsAsc(keyName,
      cuts.getOrElse(sampleCutsOne(df, keyName, buckets))))
    val gb = (partKeys ++ majorNames :+ b).map(col)
    val offs = keyed.groupBy(gb: _*).agg(count(lit(1)).as("__rr_bt"))
      .withColumn("__rr_off", coalesce(
        sum(col("__rr_bt")).over(
          Window.partitionBy(partKeys.map(col): _*)
            .orderBy(majorOrder :+ col(b).asc: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gb :+ col("__rr_off"): _*)
    keyed.join(broadcast(offs), partKeys ++ majorNames :+ b)
      .withColumn(out, col("__rr_off") + row_number().over(
        Window.partitionBy(gb: _*)
          .orderBy(col(keyName).asc)).cast("long"))
      .drop(b, "__rr_off")
  }

  /** Exact EXCLUSIVE running max of `value` in `keyName` DESC order
    * (each row sees the max over all STRICTLY-preceding rows; the
    * first row gets NULL) — the skyline/frontier sweep — without a
    * single-partition pass over the relation. Same two-pass range
    * shape as the running sum: per-bucket maxes cumulate over the
    * bounded offsets relation (strictly-earlier buckets only), and
    * the in-bucket exclusive window composes with the offset via
    * `greatest` (null-skipping, so bucket/global firsts fall out
    * naturally). Requires a tie-free `keyName` (callers pass a
    * grouped-distinct key).
    */
  def withRunningMaxDescExclusive(df: DataFrame, keyName: String,
      value: Column, out: String, buckets: Int = 64,
      cuts: Option[Array[Double]] = None): DataFrame = {
    val b = s"__rr_b_$out"
    val v = s"__rr_v_$out"
    val keyed = df.withColumn(v, value)
      .withColumn(b, bucketFromCuts(keyName,
        cuts.getOrElse(sampleCutsOne(df, keyName, buckets))))
    val offs = keyed.groupBy(col(b)).agg(max(col(v)).as("__rr_bm"))
      .withColumn("__rr_moff",
        max(col("__rr_bm")).over(Window.orderBy(col(b).asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(b), col("__rr_moff"))
    keyed.join(broadcast(offs), Seq(b))
      .withColumn(out, greatest(col("__rr_moff"),
        max(col(v)).over(Window.partitionBy(col(b))
          .orderBy(col(keyName).desc)
          .rowsBetween(Window.unboundedPreceding, -1))))
      .drop(b, v, "__rr_moff")
  }

  /** ONE eager pass sampling the cutoffs for SEVERAL keys at once —
    * for callers that stack RangeRank over multiple columns of the
    * same relation (rfm_segments' three quartile cuts): a single
    * multi-column approxQuantile action executes the base relation
    * once instead of once per key.
    */
  def sampleCuts(df: DataFrame, keyNames: Seq[String],
      buckets: Int = 64): Map[String, Array[Double]] = {
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(keyNames.map(k =>
      col(k).cast("double").as(k)): _*)
    keyNames.zip(casted.stat.approxQuantile(keyNames.toArray, probes, 0.01))
      .map { case (k, cs) => k -> cs.distinct.sorted }.toMap
  }

  private def sampleCutsOne(df: DataFrame, keyName: String,
      buckets: Int): Array[Double] =
    sampleCuts(df, Seq(keyName), buckets)(keyName)

  private val cutsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()

  /** Session-lifetime memo around the eager cut sampling: cutoffs
    * steer bucket BALANCE only, never the answer, so re-sampling the
    * same (source, column) every execution buys nothing — repeated
    * runs (bench min-of-5, multi-query sweeps over one fixture) reuse
    * the first sample. `key` must identify the data source (include
    * the dir!) — a key collision would only ever skew balance, not
    * correctness, but don't court it.
    */
  def sampleCutsMemo(key: String, df: => DataFrame, keyName: String,
      buckets: Int = 64): Array[Double] =
    cutsMemo.computeIfAbsent(key, _ => sampleCutsOne(df, keyName, buckets))

  /** Range-bucket assignment for a DESC ordering: bucket = number of
    * sampled cutoffs strictly above the key (nulls → last bucket, the
    * DESC NULLS LAST position). Monotone non-increasing in the key and
    * tie-preserving by construction.
    */
  // both directions are the codegen'd binary-search expression
  // (functions/CutsBucketExpr.scala): the earlier size(filter(...))
  // higher-order spelling is CodegenFallback and broke the
  // whole-stage span right above every RangeRank scan (r7 audit)
  private def bucketFromCuts(keyName: String, cuts: Array[Double]): Column =
    if (cuts.isEmpty) lit(0L)
    else call_function("cuts_bucket",
      col(keyName).cast("double"), typedlit(cuts), lit(false))

  /** Distributed BOUNDED ROWS frames (`ROWS BETWEEN lookback PRECEDING
    * AND …`) per group without the per-group corpus sort: rows bucket
    * by sampled key-range cuts, and each bucket is prepended with
    * CARRY rows — the last `lookback` rows before it — so an in-bucket
    * frame sees exactly what the global frame would. Carries are
    * bounded by construction: per-(group, bucket) last-`lookback`
    * candidates (a WindowGroupLimit-eligible rank) theta-joined to the
    * later buckets and re-ranked, ≤ |groups|·buckets·lookback rows end
    * to end. A row in the global last-k before bucket t is necessarily
    * in its own bucket's last-k, so the candidate union covers every
    * carry even when buckets run smaller than the lookback.
    *
    * Returns (staged, frameWindow): apply your frame aggregates over
    * `frameWindow.rowsBetween(-lookback.., ...)`, then
    * `.where(!col(carryFlag)).drop(carryFlag)` — carry rows exist only
    * to fill frames and must not be emitted. Requires (keyName,
    * tieName) tie-free; key ties never split buckets, so carry rows
    * order strictly before every main row of their target bucket.
    */
  def boundedFrameStage(df: DataFrame, partKeys: Seq[String],
      keyName: String, tieName: String, lookback: Int,
      carryFlag: String = "__rr_carry", buckets: Int = 64,
      cuts: Option[Array[Double]] = None):
      (DataFrame, org.apache.spark.sql.expressions.WindowSpec) = {
    require(lookback >= 1, s"boundedFrameStage: lookback must be >= 1")
    val b = "__rr_b_frame"
    val keyed = df.withColumn(b, bucketFromCutsAsc(keyName,
      cuts.getOrElse(sampleCutsOne(df, keyName, buckets))))
    val pb = (partKeys :+ b).map(col)
    // last `lookback` rows of each (group, bucket) — map-side
    // WindowGroupLimit keeps this a candidates pass, never a sort
    val cands = keyed.withColumn("__rr_rev", row_number().over(
        Window.partitionBy(pb: _*)
          .orderBy(col(keyName).desc, col(tieName).desc)))
      .where(col("__rr_rev") <= lookback).drop("__rr_rev")
    val targets = keyed.select(pb: _*).distinct()
      .toDF(partKeys.map("__rr_t_" + _) :+ "__rr_tb": _*)
    // candidates flow to every LATER bucket of their group, re-ranked
    // so each target keeps exactly the global last-`lookback` prefix
    val joinCond = partKeys.map(k => col(k) === col("__rr_t_" + k))
      .reduceOption(_ && _).map(_ && col(b) < col("__rr_tb"))
      .getOrElse(col(b) < col("__rr_tb"))
    val carry = cands.join(targets, joinCond)
      .drop(partKeys.map("__rr_t_" + _): _*)
      .drop(b).withColumnRenamed("__rr_tb", b)
      .withColumn("__rr_rev", row_number().over(
        Window.partitionBy(pb: _*)
          .orderBy(col(keyName).desc, col(tieName).desc)))
      .where(col("__rr_rev") <= lookback).drop("__rr_rev")
      .withColumn(carryFlag, lit(true))
    val staged = keyed.withColumn(carryFlag, lit(false))
      .unionByName(carry)
    val w = Window.partitionBy(pb: _*)
      .orderBy(col(keyName).asc, col(tieName).asc)
    (staged, w)
  }

  /** Public ASC bucket assignment for callers composing their own
    * distributed-prefix shapes (cusum's one-exchange running sum+min):
    * bucket = number of sampled cutoffs strictly below the key —
    * monotone, tie-preserving, balance-only.
    */
  def bucketAsc(keyName: String, cuts: Array[Double]): Column =
    bucketFromCutsAsc(keyName, cuts)

  /** ASC twin of [[bucketFromCuts]]: bucket = number of sampled cutoffs
    * strictly BELOW the key (nulls → last bucket = ASC NULLS LAST).
    * Monotone non-decreasing in the key, tie-preserving.
    */
  private def bucketFromCutsAsc(keyName: String, cuts: Array[Double]): Column =
    if (cuts.isEmpty) lit(0L)
    else call_function("cuts_bucket",
      col(keyName).cast("double"), typedlit(cuts), lit(true))
}
