package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col

import graft.sim.Seir.NodeStatus

/** S13: pickle sink for simulation results — a dependency-free writer
  * for the pickle stream format (protocol 2), covering the value
  * kinds a result table needs: None, bool, int/long, float, str,
  * bytes, list, tuple, dict.
  *
  * The reference persists each seed's raw SEIR output with
  * `pickle.dump(sim_res, …)` into `SIM_SEED_{seed}_raw_result.pkl`
  * (/root/reference/scripts/SimulationManager.py:239-240;
  * /root/reference/src/utils/seir_utils.py:96-110 pickles the sim
  * context and graphs the same way). That is a DRIVER-BOUNDARY
  * handoff of a by-design-small object (the scaled network is ≤10⁴
  * nodes), not a distributed sink — so the faithful Spark spelling
  * keeps the same boundary but moves the file writes EXECUTOR-side:
  * `dumpPerSeed` repartitions the status relation by seed and each
  * task writes its seeds' files directly (no driver collect, no
  * single-writer bottleneck when 100 seeds × many networks fan out
  * on a cluster).
  *
  * The stream format is public knowledge (CPython's pickletools docs
  * the opcodes); only the subset needed for plain data is emitted —
  * no class instances, no REDUCE, so nothing here can execute code on
  * load. The header declares protocol 3 (the floor for the bytes
  * opcodes; every other opcode used here is protocol ≤ 2), so
  * pickle.load in any Python ≥ 3.0 reads it.
  */
object Pickle {

  // -- opcode constants (pickletools names) --------------------------
  private val PROTO = 0x80.toByte
  private val STOP = '.'.toByte
  private val NONE = 'N'.toByte
  private val NEWTRUE = 0x88.toByte
  private val NEWFALSE = 0x89.toByte
  private val BININT = 'J'.toByte // 4-byte signed LE
  private val BININT1 = 'K'.toByte // 1-byte unsigned
  private val BININT2 = 'M'.toByte // 2-byte unsigned LE
  private val LONG1 = 0x8a.toByte // length-prefixed 2's-complement LE
  private val BINFLOAT = 'G'.toByte // 8-byte big-endian IEEE double
  private val SHORT_BINBYTES = 'C'.toByte // proto-3 bytes; len ≤ 255
  private val BINUNICODE = 'X'.toByte // 4-byte LE length + utf-8
  private val EMPTY_LIST = ']'.toByte
  private val EMPTY_DICT = '}'.toByte
  private val MARK = '('.toByte
  private val APPENDS = 'e'.toByte
  private val SETITEMS = 'u'.toByte
  private val TUPLE = 't'.toByte

  /** Marker for an explicit Python tuple (Scala tuples also map). */
  final case class PyTuple(items: Seq[Any])

  /** Writes atomically: stream to a same-directory temp file, then
    * rename over `path`. Concurrent writers of the same path (task
    * retries, speculative duplicates on a cluster) each complete a
    * whole file and the rename is last-writer-wins — a reader can
    * never observe an interleaved or truncated stream.
    */
  def dump(value: Any, path: String): Unit = {
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Files.createTempFile(
      target.toAbsolutePath.getParent, s".${target.getFileName}.", ".tmp")
    try {
      val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
      try {
        out.write(Array(PROTO, 0x03.toByte))
        write(out, value)
        out.write(STOP.toInt)
      } finally out.close()
      try
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally
      // a failed serialization (unsupported value type) must not
      // orphan its temp file in the results directory
      java.nio.file.Files.deleteIfExists(tmp)
  }

  def dumps(value: Any): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(PROTO.toInt); bos.write(0x03)
    write(bos, value)
    bos.write(STOP.toInt)
    bos.toByteArray
  }

  private def write(out: OutputStream, v: Any): Unit = v match {
    case null => out.write(NONE.toInt)
    case None => out.write(NONE.toInt)
    case Some(x) => write(out, x)
    case b: Boolean => out.write(if (b) NEWTRUE.toInt else NEWFALSE.toInt)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case s: Short => writeLong(out, s.toLong)
    case b: Byte => writeLong(out, b.toLong)
    case d: Double => writeDouble(out, d)
    case f: Float => writeDouble(out, f.toDouble)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.write(BINUNICODE.toInt); writeLE4(out, b.length); out.write(b)
    case b: Array[Byte] =>
      // SHORT_BINBYTES covers ≤255; longer payloads chunk through a
      // list would change semantics — use BINUNICODE-style 4-byte
      // BINBYTES ('B', proto 3) for the general case
      if (b.length <= 255) {
        out.write(SHORT_BINBYTES.toInt); out.write(b.length); out.write(b)
      } else {
        out.write('B'.toInt); writeLE4(out, b.length); out.write(b)
      }
    case t: PyTuple => writeTuple(out, t.items)
    case t: Product if t.getClass.getName.startsWith("scala.Tuple") =>
      writeTuple(out, t.productIterator.toSeq)
    case m: collection.Map[_, _] =>
      out.write(EMPTY_DICT.toInt)
      if (m.nonEmpty) {
        out.write(MARK.toInt)
        m.foreach { case (k, x) => write(out, k); write(out, x) }
        out.write(SETITEMS.toInt)
      }
    case xs: Iterable[_] =>
      out.write(EMPTY_LIST.toInt)
      if (xs.nonEmpty) {
        out.write(MARK.toInt)
        xs.foreach(write(out, _))
        out.write(APPENDS.toInt)
      }
    case xs: Array[_] =>
      write(out, xs.toSeq)
    // Spark Row column types beyond the primitives, so dumpDataFrame
    // accepts any registered operator's result schema: temporal values
    // as ISO strings (lossless, no pytz dependency on load), decimals
    // as doubles (the same cast every oracle applies before compare),
    // struct rows as dicts.
    case t: java.sql.Timestamp => write(out, t.toString)
    case d: java.sql.Date => write(out, d.toString)
    case t: java.time.Instant => write(out, t.toString)
    case d: java.time.LocalDate => write(out, d.toString)
    case d: java.time.LocalDateTime => write(out, d.toString)
    case b: java.math.BigDecimal => writeDouble(out, b.doubleValue())
    case b: BigDecimal => writeDouble(out, b.toDouble)
    case r: Row =>
      val schema = r.schema
      if (schema != null)
        write(out, schema.fieldNames.zipWithIndex
          .map { case (n, i) => n -> r.get(i) }.toMap)
      else write(out, r.toSeq)
    case other => throw new IllegalArgumentException(
      s"pickle: unsupported type ${other.getClass.getName}")
  }

  private def writeLE4(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeTuple(out: OutputStream, items: Seq[Any]): Unit = {
    // general MARK…TUPLE covers every arity (TUPLE1-3 are just
    // shorter encodings of the same value)
    out.write(MARK.toInt)
    items.foreach(write(out, _))
    out.write(TUPLE.toInt)
  }

  private def writeLong(out: OutputStream, l: Long): Unit =
    if (l >= 0 && l <= 255) { out.write(BININT1.toInt); out.write(l.toInt) }
    else if (l >= 0 && l <= 65535) {
      out.write(BININT2.toInt); out.write((l & 0xff).toInt); out.write(((l >> 8) & 0xff).toInt)
    } else if (l >= Int.MinValue && l <= Int.MaxValue) {
      out.write(BININT.toInt); writeLE4(out, l.toInt)
    } else {
      // minimal-length little-endian two's complement
      var n = 8
      while (n > 1 && isRedundantTopByte(l, n)) n -= 1
      out.write(LONG1.toInt); out.write(n)
      var i = 0
      while (i < n) { out.write(((l >> (8 * i)) & 0xff).toInt); i += 1 }
    }

  /** Top byte is redundant when it (and the next byte's sign bit)
    * encode nothing beyond sign extension.
    */
  private def isRedundantTopByte(l: Long, n: Int): Boolean = {
    val top = (l >> (8 * (n - 1))) & 0xff
    val nextSign = (l >> (8 * (n - 2))) & 0x80
    (top == 0xff && nextSign == 0x80) || (top == 0x00 && nextSign == 0x00)
  }

  private def writeDouble(out: OutputStream, d: Double): Unit = {
    out.write(BINFLOAT.toInt)
    val bits = java.lang.Double.doubleToLongBits(d)
    var i = 7
    while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  // ------------------------------------------------------------------
  // The S13 sink: per-seed SEIR result files, reference layout.
  // ------------------------------------------------------------------

  /** Writes one `SIM_SEED_{seed}_raw_result.pkl` per seed under `dir`
    * (the reference's SimulationManager.py:239-240 layout), each a
    * dict {'seed': int, 'node_statuses': [{'node': …, 't_e': …,
    * 't_i': …, 't_r': …}, …]} sorted by node id. Statuses repartition
    * by seed so each executor task writes only its own seeds' files —
    * the reference's per-process boundary, parallelized. `dir` must be
    * a path every executor can reach (local[…] or shared FS).
    */
  def dumpPerSeed(statuses: Dataset[NodeStatus], dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    statuses.repartition(col("seed")).foreachPartition {
      (it: Iterator[NodeStatus]) =>
        it.toSeq.groupBy(_.seed).foreach { case (seed, rows) =>
          val payload = Map(
            "seed" -> seed,
            "node_statuses" -> rows.sortBy(_.nodeId).map(r => Map(
              "node" -> r.nodeId, "t_e" -> r.tE, "t_i" -> r.tI,
              "t_r" -> r.tR)))
          dump(payload, s"$dir/SIM_SEED_${seed}_raw_result.pkl")
        }
    }
  }

  /** Generic result-table pickle: a DataFrame as a list of row dicts
    * (column name → value), driver-side — for catalog-sized result
    * tables only, the same boundary as the reference's pickle.dump of
    * its in-memory results.
    */
  def dumpDataFrame(df: org.apache.spark.sql.DataFrame, path: String,
      maxRows: Int = 1000000): Unit = {
    val names = df.columns
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"pickle sink is a driver-boundary handoff for small results; " +
        s"got > $maxRows rows — write parquet instead")
    val data: Seq[Any] = rows.toSeq.map { (r: Row) =>
      names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }
    dump(data, path)
  }
}
