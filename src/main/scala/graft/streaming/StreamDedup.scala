package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Streaming MinHash/LSH near-duplicate SUPPRESSION: keep the first
  * document of each LSH band bucket, emit a dup edge (doc → keeper)
  * for every later arrival that collides — the streaming counterpart
  * of the batch `dedup_minhash_lsh` candidate join, for ingest
  * pipelines that must drop near-dups as documents ARRIVE rather
  * than in a nightly batch.
  *
  * Shape: one codegen'd per-row minhash pass (the batch
  * [[graft.functions.MinHashSigExpr]] kernel — zero exchanges for
  * signatures), explode to (band_key, doc) rows, then ONE stateful
  * shuffle keyed by band: a `transformWithState` processor holds one
  * ValueState[Long] — the bucket's keeper — per distinct band key.
  * State is O(distinct band keys), sharded across executors by the
  * band hash exactly like the batch join's exchange; a TTLConfig
  * converts it to a sliding-recency corpus at 100 TB (dup-of-anything
  * -ever is unbounded for an unbounded stream by definition).
  *
  * Within a micro-batch, first-wins resolves deterministically to the
  * SMALLEST doc_id (arrival order inside a batch is partition-
  * dependent, so "first" must be a total order to be reproducible —
  * the prorate_exact lesson applied to streams).
  */
object StreamDedup {

  case class BandHit(band_key: String, doc_id: Long)
  case class DupEdge(doc_id: Long, keeper_id: Long, band_key: String)

  class Processor extends StatefulProcessor[String, BandHit, DupEdge] {
    @transient private var keeper: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeper", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandHit],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DupEdge] = {
      val ids = rows.map(_.doc_id).toArray.distinct.sorted
      val keep =
        if (keeper.exists()) keeper.get()
        else { keeper.update(ids.head); ids.head }
      ids.iterator.filter(_ != keep).map(DupEdge(_, keep, key))
    }
  }

  case class BandHitTs(band_key: String, doc_id: Long, ts: Long)
  case class KeeperState(keeper_id: Long, last_seen: Long)

  /** Sliding-recency keeper (TODO r19 carry-over): the unbounded
    * "dup-of-anything-ever" corpus becomes a recency window — a bucket
    * whose last hit is more than `ttlMs` of EVENT time ago has expired,
    * and the next arrival is RE-ADMITTED as the bucket's new keeper
    * (no dup edge; later colliders point at the new keeper). Every hit
    * — keeper re-arrival or dup — refreshes the bucket's recency
    * (sliding, not admission-anchored), so an actively-colliding
    * bucket never expires but a dormant one is forgotten.
    *
    * Determinism: rows are processed in (ts, doc_id) order within a
    * micro-batch, and recency only moves forward (`max`), so a late
    * out-of-order row can neither un-expire a bucket nor roll its
    * window back — replaying the same batches yields the same edges.
    *
    * State size: the event-time window bounds which entries are LIVE;
    * a production deployment ALSO passes a processing-time TTLConfig
    * (sized ≥ the event-time window + max expected lateness) so the
    * store physically evicts what the logic has already expired —
    * expiry CORRECTNESS never depends on wall-clock eviction.
    */
  class TtlProcessor(ttlMs: Long, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, BandHitTs, DupEdge] {
    @transient private var st: ValueState[KeeperState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[KeeperState]("keeper",
        Encoders.product[KeeperState], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandHitTs],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DupEdge] = {
      // per-bucket batch volume is collision-bounded (the same bound
      // as the non-TTL processor's distinct/sort buffer)
      val sorted = rows.toArray.sortBy(r => (r.ts, r.doc_id))
      val out = Seq.newBuilder[DupEdge]
      var cur = if (st.exists()) Option(st.get()) else None
      sorted.foreach { r =>
        cur match {
          case Some(k) if r.ts - k.last_seen <= ttlMs =>
            if (r.doc_id != k.keeper_id) out += DupEdge(r.doc_id, k.keeper_id, key)
            cur = Some(k.copy(last_seen = math.max(k.last_seen, r.ts)))
          case _ => // vacant or expired: (re-)admit, no edge
            cur = Some(KeeperState(r.doc_id, r.ts))
        }
      }
      cur.foreach(st.update)
      out.result().iterator
    }
  }

  /** (band_key, doc_id) rows of a document stream — the same
    * signature arithmetic and 8-byte band hashing as the batch LSH
    * (numHashes/bandSize mirror `Dedup`'s constants).
    */
  def bandHits(spark: SparkSession, docsDir: String,
      numHashes: Int = 8, bandSize: Int = 4): DataFrame = {
    import graft.functions.GraftFunctions.minhash_sig
    val schema = spark.read.parquet(docsDir).schema
    val bands = (0 until numHashes / bandSize).map { bi =>
      concat_ws(":", lit(bi),
        xxhash64((0 until bandSize)
          .map(j => element_at(col("sig"), bi * bandSize + j + 1)): _*))
    }
    spark.readStream.schema(schema).parquet(docsDir)
      .select(col("doc_id"), minhash_sig(col("text"), lit(numHashes)).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id"), explode(array(bands: _*)).as("band_key"))
  }

  /** The dup-edge stream: append-mode evidence rows (doc_id, keeper_id,
    * band_key) for every near-dup arrival. Keepers never appear as
    * doc_id unless they re-arrive after being admitted.
    */
  def dupEdges(spark: SparkSession, docsDir: String): Dataset[DupEdge] = {
    import spark.implicits._
    bandHits(spark, docsDir)
      .as[BandHit]
      .groupByKey(_.band_key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }

  /** The TTL'd dup-edge stream: the source must carry an event-time
    * long column `tsCol` (epoch millis); buckets idle for more than
    * `ttlMs` expire and the next collider is re-admitted as keeper.
    *
    * `stateTtl` is the PHYSICAL eviction knob: without it the
    * event-time expiry above is semantic only — expired entries stay
    * in the state store and state grows with distinct band keys.
    * Passing a processing-time TTLConfig bounds the store itself
    * (entries a long-idle band key would re-admit anyway get dropped
    * physically); it also switches the processor to
    * TimeMode.ProcessingTime, which the state-TTL machinery requires.
    * Size it ≥ the event-time ttlMs plus the max expected
    * ingestion lag, so physical eviction never races semantic expiry.
    */
  def dupEdgesTtl(spark: SparkSession, docsDir: String, ttlMs: Long,
      tsCol: String = "ts", maxFilesPerTrigger: Option[Int] = None,
      stateTtl: Option[TTLConfig] = None)
      : Dataset[DupEdge] = {
    import graft.functions.GraftFunctions.minhash_sig
    import spark.implicits._
    val numHashes = 8; val bandSize = 4
    val schema = spark.read.parquet(docsDir).schema
    val bands = (0 until numHashes / bandSize).map { bi =>
      concat_ws(":", lit(bi),
        xxhash64((0 until bandSize)
          .map(j => element_at(col("sig"), bi * bandSize + j + 1)): _*))
    }
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(docsDir)
      .select(col("doc_id"), col(tsCol).cast("long").as("ts"),
        minhash_sig(col("text"), lit(numHashes)).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id"), col("ts"),
        explode(array(bands: _*)).as("band_key"))
      .as[BandHitTs]
      .groupByKey(_.band_key)
      .transformWithState(
        new TtlProcessor(ttlMs, stateTtl.getOrElse(TTLConfig.NONE)),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
