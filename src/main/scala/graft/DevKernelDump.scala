package graft

import org.apache.spark.sql.functions.col

/** Companion main for `tools/fuzz_kernels.py`: read a one-column
  * (`s` STRING) parquet corpus, apply every registered string kernel
  * ([[operators.WebCuration.kernelOracles]]), write the results plus
  * the DuckDB expression for each kernel so the tool can replay the
  * identical corpus through the other engine and diff.
  */
object DevKernelDump {
  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    val spark = Sessions.build("kernel-dump", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(in)
    val kernels = operators.WebCuration.kernelOracles.toSeq.sortBy(_._1)
    corpus.select(col("s") +: kernels.map { case (name, (k, _)) =>
        k(col("s")).as(name) }: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/results.parquet")
    val sqlJson = kernels.map { case (name, (_, sql)) =>
        s""""$name": ${ujsonEscape(sql)}""" }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "kernel_sql.json"),
      sqlJson.getBytes("UTF-8"))
    spark.stop()
  }

  /** Shared by the kernel-dump mains (this + [[DevPairKernelDump]]). */
  private[graft] def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
