package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Arbitrary stateful processing through Spark 4's transformWithState
  * API (the successor to mapGroupsWithState): a per-user running event
  * counter + running value sum whose state lives in the RocksDB state
  * store. Each micro-batch emits the UPDATED totals for the users it
  * touched — the live per-entity aggregate a monitoring pipeline
  * maintains over an unbounded stream.
  *
  * State is one (long, double) pair per user — O(active users), not
  * O(events); with a TTLConfig the store also evicts dormant users,
  * which is the 100 TB-stream answer to unbounded key cardinality.
  */
object RunningStats {

  case class Ev(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  class Processor extends StatefulProcessor[Long, Ev, UserTotals] {
    @transient private var count: ValueState[Long] = _
    @transient private var total: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)
      total = getHandle.getValueState[Double]("total", Encoders.scalaDouble,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var n = if (count.exists()) count.get() else 0L
      var s = if (total.exists()) total.get() else 0.0
      rows.foreach { e => n += 1; s += e.value }
      count.update(n)
      total.update(s)
      Iterator.single(UserTotals(key, n, s))
    }
  }

  /** Streaming per-user running totals over an events directory. */
  def runningTotals(spark: SparkSession, eventsDir: String): Dataset[UserTotals] = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
      .select(col("user_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
