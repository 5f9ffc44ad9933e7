package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-spec geohash encoding (base32 over interleaved lat/lon
  * bisection bits — Niemeyer's scheme, as documented publicly).
  *
  * An 8-char geohash is 40 bits: 20 longitude + 20 latitude,
  * interleaved lon-first from the MSB. The successive-bisection
  * definition collapses to one floor per axis — bit i of
  * floor((lon+180)/360·2²⁰) IS the i-th bisection outcome — then a
  * closed-form magic-mask spread (the 64-bit variant of
  * [[ZOrder]]'s 32-bit one, no loops, fully codegen'd built-ins)
  * and a 5-bit→base32 lookup per character. The oracle runs the
  * identical arithmetic, so ids are cross-engine exact; like all
  * layout keys here, the value is a deterministic pure function —
  * prefix-truncating it coarsens the cell, which is what makes it a
  * join/partition key for proximity blocking.
  */
object GeoHash {

  private val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Spread the low 20 bits of x to even bit positions 0,2,..,38. */
  private def spread(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x3333333333333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 20-bit axis cell index from a coordinate. */
  private def axis(v: Column, offset: Double, range: Double): Column =
    least(floor((v + lit(offset)) / lit(range) * lit(1048576.0)).cast("long"),
      lit(1048575L))

  /** The 40-bit interleaved value (lon bits at odd positions — the
    * geohash MSB is a longitude bit).
    */
  def interleaved(lat: Column, lon: Column): Column =
    spread(axis(lat, 90.0, 180.0))
      .bitwiseOR(shiftleft(spread(axis(lon, 180.0, 360.0)), 1))

  private val b32arr = array(b32.map(c => lit(c.toString)): _*)

  /** 8-char geohash from the interleaved value. */
  def encode8(n: Column): Column =
    concat((0 until 8).map(i =>
      get(b32arr, shiftright(n, 35 - 5 * i).bitwiseAND(lit(31L)).cast("int"))): _*)

  // ---------------------------------------------------------- SQL mirror

  private def spreadSql(x: String): String = {
    val m0 = s"($x & 1048575)"
    val m1 = s"(($m0 | ($m0 << 16)) & ${0x0000FFFF0000FFFFL})"
    val m2 = s"(($m1 | ($m1 << 8)) & ${0x00FF00FF00FF00FFL})"
    val m3 = s"(($m2 | ($m2 << 4)) & ${0x0F0F0F0F0F0F0F0FL})"
    val m4 = s"(($m3 | ($m3 << 2)) & ${0x3333333333333333L})"
    s"(($m4 | ($m4 << 1)) & ${0x5555555555555555L})"
  }

  private def axisSql(v: String, offset: Int, range: Int): String =
    s"least(CAST(floor(($v + CAST($offset AS DOUBLE)) / $range * 1048576)" +
      s" AS BIGINT), 1048575)"

  /** DuckDB spelling of [[interleaved]] (identical constants/shifts). */
  def interleavedSql(lat: String, lon: String): String =
    s"(${spreadSql(axisSql(lat, 90, 180))}" +
      s" | (${spreadSql(axisSql(lon, 180, 360))} << 1))"

  /** DuckDB spelling of [[encode8]] over a column holding the
    * interleaved value.
    */
  def encode8Sql(n: String): String =
    (0 until 8)
      .map(i => s"substr('$b32', CAST(($n >> ${35 - 5 * i}) & 31 AS INT) + 1, 1)")
      .mkString("concat(", ", ", ")")
}
