package graft

/** Dev-only: A/B the two observed_contacts spellings — value equality
  * plus warm min-of-5 timings.
  * `sbt "runMain graft.DevContactsAB [sfDir]"`.
  */
object DevContactsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Sessions.build("graft-contacts-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Interactions
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val a = collectMap(Interactions.observedContactsJoined(spark, sfDir))
    val b = collectMap(Interactions.observedContacts(spark, sfDir))
    System.err.println(s"[ab] equal=${a == b} |a|=${a.size} |b|=${b.size}")
    if (a != b) {
      val onlyA = (a.keySet -- b.keySet).take(5)
      val onlyB = (b.keySet -- a.keySet).take(5)
      val diff = a.keySet.intersect(b.keySet).filter(k => a(k) != b(k)).take(5)
      System.err.println(s"[ab] onlyA=$onlyA onlyB=$onlyB diffKeys=${diff.map(k => (k, a(k), b(k)))}")
      sys.exit(1)
    }
    def time(tag: String, f: () => Unit): Unit = {
      f() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[ab] $tag min=${ts.min}%.3f raw=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
    }
    time("join ", () => { Interactions.observedContactsJoined(spark, sfDir).count(); () })
    time("fused", () => { Interactions.observedContacts(spark, sfDir).count(); () })
    spark.stop()
  }
}
