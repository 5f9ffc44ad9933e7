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

  /** Range-bucket assignment for a DESC ordering: bucket = number of
    * sampled cutoffs strictly above the key (nulls → last bucket, the
    * DESC NULLS LAST position). Monotone non-increasing in the key and
    * tie-preserving by construction.
    */
  private def bucketFromCuts(keyName: String, cuts: Array[Double]): Column =
    if (cuts.isEmpty) lit(0L)
    else {
      val arr = typedlit(cuts)
      when(col(keyName).isNull, lit(cuts.length.toLong))
        .otherwise(size(filter(arr,
          c => c > col(keyName).cast("double"))).cast("long"))
    }

  /** ASC twin of [[bucketFromCuts]]: bucket = number of sampled cutoffs
    * strictly BELOW the key (nulls → last bucket = ASC NULLS LAST).
    * Monotone non-decreasing in the key, tie-preserving.
    */
  private def bucketFromCutsAsc(keyName: String, cuts: Array[Double]): Column =
    if (cuts.isEmpty) lit(0L)
    else {
      val arr = typedlit(cuts)
      when(col(keyName).isNull, lit(cuts.length.toLong))
        .otherwise(size(filter(arr,
          c => c < col(keyName).cast("double"))).cast("long"))
    }
}
