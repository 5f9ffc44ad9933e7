package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues}

/** Streaming Misra-Gries heavy hitters through transformWithState:
  * the mergeable frequent-items summary maintained INCREMENTALLY over
  * an unbounded token stream, token-partitioned so state shards across
  * executors.
  *
  * Sharding preserves the guarantee: tokens group by hash bucket, each
  * bucket runs an independent capacity-c summary over exactly its own
  * substream (a token lives in one bucket, so its estimate never mixes
  * with other buckets' decrements), and every token with true bucket
  * count > len(bucket substream)/(c+1) is guaranteed present — the
  * per-shard form of the batch aggregate's bound
  * (functions/HeavyHitters.scala, bound-checked in R7OpsSpec).
  *
  * State is O(buckets × capacity) REGARDLESS of stream length or
  * vocabulary — the whole point of a sketch on an unbounded stream;
  * each micro-batch emits the refreshed summaries for touched buckets
  * (OutputMode.Update), the live "trending tokens" feed.
  */
object StreamingHeavyHitters {

  case class Tok(bucket: Long, token: String)
  case class Hit(bucket: Long, token: String, est: Long)

  class Processor(capacity: Int) extends StatefulProcessor[Long, Tok, Hit] {
    @transient private var counters: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[Hit] = {
      // hydrate the shard's summary once per micro-batch, run the
      // classic update (increment / insert / decrement-all), write back
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      counters.iterator().foreach { case (t, c) => m(t) = c }
      // tombstone candidates are ONLY the tokens a downstream
      // latest-value consumer could hold a stale estimate for — i.e.
      // residents at batch START. Tokens that are inserted and evicted
      // within this same batch were never emitted, so a tombstone for
      // them would be pure Update-stream noise.
      val residentAtStart = Set.empty[String] ++ m.keysIterator
      rows.foreach { r =>
        val t = r.token
        if (m.contains(t)) m(t) += 1L
        else if (m.size < capacity) m(t) = 1L
        else {
          // decrement-all; evict zeros (at most `capacity` work per
          // non-resident token — the MG amortized step)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          m.keysIterator.foreach { k =>
            val v = m(k) - 1L
            if (v == 0L) dead += k else m(k) = v
          }
          dead.foreach(m.remove)
        }
      }
      counters.clear()
      m.foreach { case (t, c) => counters.updateValue(t, c) }
      m.iterator.map { case (t, c) => Hit(key, t, c) } ++
        residentAtStart.iterator.filterNot(m.contains).map(t => Hit(key, t, 0L))
    }
  }

  /** Streaming heavy-hitter summaries over a documents directory:
    * tokens shard into 8 hash buckets, each with a capacity-64 summary.
    */
  def trendingTokens(spark: SparkSession, docsDir: String,
      buckets: Int = 8, capacity: Int = 64): Dataset[Hit] = {
    import spark.implicits._
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream.schema(schema).parquet(docsDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .select(pmod(xxhash64(col("token")), lit(buckets.toLong)).as("bucket"),
        col("token"))
      .as[Tok]
      .groupByKey(_.bucket)
      .transformWithState(new Processor(capacity), TimeMode.None(),
        OutputMode.Update())
  }
}
