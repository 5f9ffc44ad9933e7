package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `ping_gen` — a full DataSource V2 implementation: a deterministic
  * synthetic mobility-ping generator (the scale-testing companion to
  * the reference's daily ping partitions). Demonstrates the complete
  * connector surface: TableProvider + DataSourceRegister (short name),
  * SupportsRead table, ScanBuilder with FILTER PUSHDOWN (user_id
  * predicates narrow the generated range — rows that can't match are
  * never materialized), distributed partition planning (contiguous
  * user slices; no driver-side data), and per-partition readers.
  *
  * Every field derives from the engine-portable md5 hash of the
  * logical indices ([[graft.functions.CrossHash]] semantics), NOT from
  * a seeded RNG: the dataset is identical for any partition count, any
  * pushdown, any engine — so the source itself is oracle-checkable
  * bit-for-bit against DuckDB reproducing the same arithmetic.
  *
  * Usage: `spark.read.format("ping_gen").option("users", 50)
  * .option("days", 3).option("pings", 20).option("numPartitions", 8)
  * .load()` → (user_id, ts, lat, lon, accuracy).
  */
class PingGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ping_gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PingGen.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PingGenTable(new CaseInsensitiveStringMap(properties))
}

object PingGen {
  val Schema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("accuracy", DoubleType, nullable = false)))

  /** 2020-01-01T00:00:00Z — the reference's partition-range floor. */
  val EpochStart = 1577836800L

  /** JVM twin of CrossHash.hash60 (first 15 md5 hex chars as a 60-bit
    * positive long): first 7 digest bytes + the high nibble of byte 8
    * — byte-identical to the hex-prefix parse both engines run.
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** DuckDB SQL producing the identical relation (for oracle use). */
  def oracleSql(users: Long, days: Int, pings: Int): String = {
    def h(tag: String) =
      s"CAST('0x' || substr(md5('$tag:' || u || ':' || d || ':' || i), 1, 15) AS BIGINT)"
    s"""SELECT u AS user_id,
       |  make_timestamp((${EpochStart} + d * 86400 + ${h("p")} % 86400) * 1000000) AS ts,
       |  19.0 + (${h("lat")} % 1000000) / 1000000.0 AS lat,
       |  -99.5 + (${h("lon")} % 1000000) / 1000000.0 AS lon,
       |  CAST(${h("acc")} % 150 AS DOUBLE) AS accuracy
       |FROM (SELECT unnest(range(0, $users)) AS u),
       |     (SELECT unnest(range(0, $days)) AS d),
       |     (SELECT unnest(range(0, $pings)) AS i)""".stripMargin
  }
}

private[sources] class PingGenTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  private val users = options.getLong("users", 50L)
  private val days = options.getInt("days", 3)
  private val pings = options.getInt("pings", 20)
  private val parts = options.getInt("numPartitions", 8)

  override def name(): String = s"ping_gen(users=$users, days=$days, pings=$pings)"
  override def schema(): StructType = PingGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PingGenScanBuilder(users, days, pings, parts)
}

/** Pushdown: user_id range predicates narrow [lo, hi) at PLANNING
  * time; the reader never generates a row outside the range. Pushed
  * filters are exact (range slicing), so they are consumed here and
  * NOT re-evaluated post-scan; anything else stays residual for Spark.
  */
private[sources] class PingGenScanBuilder(
    users: Long, days: Int, pings: Int, parts: Int)
  extends ScanBuilder with SupportsPushDownFilters {

  private var lo = 0L
  private var hi = users
  private var pushed = Array.empty[Filter]

  private def narrow(f: Filter): Boolean = f match {
    case EqualTo("user_id", v: Number) =>
      lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1); true
    case GreaterThan("user_id", v: Number) =>
      lo = math.max(lo, v.longValue() + 1); true
    case GreaterThanOrEqual("user_id", v: Number) =>
      lo = math.max(lo, v.longValue()); true
    case LessThan("user_id", v: Number) =>
      hi = math.min(hi, v.longValue()); true
    case LessThanOrEqual("user_id", v: Number) =>
      hi = math.min(hi, v.longValue() + 1); true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(narrow)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new PingGenScan(lo, math.max(lo, hi), days, pings, parts)
}

private[sources] class PingGenScan(
    lo: Long, hi: Long, days: Int, pings: Int, parts: Int)
  extends Scan with Batch {

  override def readSchema(): StructType = PingGen.Schema
  override def description(): String =
    s"PingGenScan users=[$lo,$hi) days=$days pings=$pings"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // degenerate configs (empty user range, zero days/pings) must plan
    // an EMPTY scan — the reader's index arithmetic assumes days ≥ 1
    // and pings ≥ 1 and would otherwise fabricate rows
    if (hi <= lo || days <= 0 || pings <= 0) return Array.empty
    val n = math.max(1, math.min(parts.toLong, hi - lo).toInt)
    val span = hi - lo
    (0 until n).map { p =>
      val s = lo + span * p / n
      val e = lo + span * (p + 1) / n
      PingGenPartition(s, e, days, pings): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    PingGenReaderFactory
}

private[sources] final case class PingGenPartition(
    startUser: Long, endUser: Long, days: Int, pings: Int)
  extends InputPartition

private[sources] object PingGenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PingGenPartition]
    new PartitionReader[InternalRow] {
      private var u = p.startUser
      private var d = 0
      private var i = -1
      private var row: InternalRow = _

      override def next(): Boolean = {
        i += 1
        if (i >= p.pings) { i = 0; d += 1 }
        if (d >= p.days) { d = 0; u += 1 }
        if (u >= p.endUser) return false
        val key = s"$u:$d:$i"
        val sec = PingGen.hash60(s"p:$key") % 86400L
        val micros = (PingGen.EpochStart + d * 86400L + sec) * 1000000L
        val lat = 19.0 + (PingGen.hash60(s"lat:$key") % 1000000L) / 1000000.0
        val lon = -99.5 + (PingGen.hash60(s"lon:$key") % 1000000L) / 1000000.0
        val acc = (PingGen.hash60(s"acc:$key") % 150L).toDouble
        row = new GenericInternalRow(Array[Any](u, micros, lat, lon, acc))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
