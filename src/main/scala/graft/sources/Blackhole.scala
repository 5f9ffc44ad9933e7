package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `blackhole` — the WRITE half of the DataSource V2 surface
  * ([[PingGen]] is the read half): a sink that discards rows but runs
  * the full distributed commit protocol — per-partition DataWriters
  * count what they consume, executors ship WriterCommitMessages, and
  * the driver-side commit() aggregates them into queryable metrics.
  * The production uses: benchmarking a pipeline without sink IO in the
  * measurement, and dry-run validation (does the whole plan execute?)
  * before pointing at a real table.
  *
  * Abort semantics are honest: a failed/speculative task's counts are
  * discarded with its message, so metrics reflect COMMITTED rows only
  * — the same exactly-once accounting a real sink's commit protocol
  * provides.
  */
class Blackhole extends TableProvider with DataSourceRegister {
  override def shortName(): String = "blackhole"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlackholeTable(schema,
      Option(properties.get("name")).getOrElse("default"))
}

object Blackhole {
  private val counts = new ConcurrentHashMap[String, Long]()

  /** Committed row count for a named write (0 if never written). */
  def rowsWritten(name: String): Long = counts.getOrDefault(name, 0L)

  private[sources] def record(name: String, n: Long): Unit =
    counts.merge(name, n, (a, b) => a + b)

  /** Clear a named counter (test isolation). */
  def reset(name: String): Unit = counts.remove(name)
}

private[sources] class BlackholeTable(writeSchema: StructType, sinkName: String)
  extends Table with SupportsWrite {
  override def name(): String = s"blackhole($sinkName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var truncateFirst = false
      // backs the TRUNCATE capability: overwrite mode resets the
      // counter before the new write's commit lands
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new BlackholeBatchWrite(sinkName, truncateFirst)
      }
    }
}

private[sources] class BlackholeBatchWrite(sinkName: String, truncateFirst: Boolean)
  extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    BlackholeWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // truncate applies atomically WITH the commit, not at job start: a
    // failed overwrite must leave the previous count intact
    if (truncateFirst) Blackhole.reset(sinkName)
    val total = messages.collect { case BlackholeCommit(n) => n }.sum
    Blackhole.record(sinkName, total)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] final case class BlackholeCommit(rows: Long)
  extends WriterCommitMessage

private[sources] object BlackholeWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = BlackholeCommit(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
