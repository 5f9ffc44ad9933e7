package graft
/** Dev: print SparkEntry.queries iteration order (Verify's execution
  * order) so a stuck sweep query can be identified from the completed
  * set without a driver restart.
  */
object DevListOrder {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.zipWithIndex.foreach { case (n, i) =>
      println(f"$i%3d $n")
    }
}
