package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full operator registry (SURVEY §2 inventory + LLM-pipeline ops). */
  lazy val allOps: Seq[Op] =
    Aggregations.ops ++ Interactions.ops ++ Extraction.ops ++
      Ntl.ops ++ Joins.ops ++ Dedup.ops ++ TextAnalysis.ops ++
      Similarity.ops ++ Multimodal.ops ++ Mobility.ops ++
      Imputation.ops ++ Scaling.ops ++ Spatial.ops ++
      Analytics.ops ++ Temporal.ops ++ Clustering.ops ++
      GraphMetrics.ops ++ Curation.ops ++ Chunking.ops ++ Behavior.ops ++
      WebCuration.ops ++ Sketches.ops ++ Tokenizer.ops ++ Classifier.ops ++
      Linalg.ops ++
      Layout.ops ++ Stats.ops ++ Recommend.ops ++ TpchMore.ops ++
      Profiling.ops ++ StringSim.ops ++ TextEval.ops ++
      graft.streaming.StreamOps.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Interactions.totalVsObserved(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.name -> o.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(sql => o.name -> sql)).toMap

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[Op] = allOps.filter(_.bench)
}
