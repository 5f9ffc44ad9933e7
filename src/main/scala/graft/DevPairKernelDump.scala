package graft

import org.apache.spark.sql.functions.col

/** Companion main for `tools/fuzz_string_sim.py`: read a two-column
  * (`a`,`b` STRING) parquet corpus, apply every registered string-pair
  * kernel ([[operators.StringSim.pairKernelOracles]]), write the
  * results plus the DuckDB expression for each kernel so the tool can
  * replay the identical pairs through the other engine and diff.
  * Same contract as [[DevKernelDump]] for the unary kernels.
  */
object DevPairKernelDump {
  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    val spark = Sessions.build("pair-kernel-dump", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(in)
    val kernels = operators.StringSim.pairKernelOracles.toSeq.sortBy(_._1)
    corpus.select(col("id") +: col("a") +: col("b") +:
        kernels.map { case (name, (k, _)) => k(col("a"), col("b")).as(name) }: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/results.parquet")
    val sqlJson = kernels.map { case (name, (_, sql)) =>
        s""""$name": ${DevKernelDump.ujsonEscape(sql)}""" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "kernel_sql.json"),
      sqlJson.getBytes("UTF-8"))
    spark.stop()
  }
}
