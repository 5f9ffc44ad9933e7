package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink inventory (SURVEY §2.1).
  *
  * The reference exchanges every stage boundary through files; this
  * engine composes stages lazily and only materializes at declared
  * checkpoints, but it supports the same physical formats:
  * parquet scans/globs (S1-S3), Hive-partitioned datasets with
  * partition pruning (S2/S8), CSV with schema inference (S4/S10),
  * and a bench-log append table (S14).
  */
object Sources {

  /** S1/S3: parquet file or glob. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S2: Hive-partitioned dataset scan; filters on partition columns
    * prune directories at planning time (replaces the reference's
    * by-hand path interpolation —
    * /root/reference/scripts/NetworkBuilder.py:66-73).
    */
  def partitionedDataset(spark: SparkSession, root: String): DataFrame =
    spark.read.option("basePath", root).parquet(root)

  /** S4: CSV scan with header + schema inference
    * (/root/reference/scripts/csv_infected.py:71-75).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S7/S9: parquet sink (overwrite). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S8: partitioned parquet sink — the reference's
    * `partition_cols=["year","month","day","cve_zm"]` layout
    * (/root/reference/scripts/IndexingHomeAgebs.py:144-146).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** S10: CSV sink with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S14: bench-log append table (same three-column schema as the
    * reference's Benchmark DuckDB table —
    * /root/reference/src/utils/stopwatch.py:63-79).
    */
  def logBench(spark: SparkSession, path: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp, elapsedSecs: Double): Unit = {
    import spark.implicits._
    Seq((start, end, elapsedSecs))
      .toDF("start_date", "end_date", "elapsed_time")
      .write.mode(SaveMode.Append).parquet(path)
  }
}
