package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-dimensional data layout.
  *
  * Interleaving the bits of two sort keys gives a single clustering key
  * whose contiguous ranges are 2-D locality boxes: range-partitioning +
  * sorting files by the z-value bounds BOTH dimensions' min/max per
  * file, so predicates on EITHER column prune files — the layout trick
  * behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain integer
  * bit arithmetic (closed-form magic-mask spreading, no loops, fully
  * codegen'd by Catalyst as built-in expressions, and expressible
  * verbatim in any engine with shifts — the oracle runs the identical
  * formula).
  *
  * Domain: the low 16 bits of each key (callers quantize/clamp first);
  * the result is a 32-bit value in a non-negative long.
  */
object ZOrder {

  /** Spread the low 16 bits of x to even bit positions 0,2,..,30. */
  private def spread(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** z-value of (a, b): a's bits at even positions, b's at odd. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  private def spreadSql(x: String): String = {
    val m0 = s"($x & 65535)"
    val m1 = s"(($m0 | ($m0 << 8)) & 16711935)"
    val m2 = s"(($m1 | ($m1 << 4)) & 252645135)"
    val m3 = s"(($m2 | ($m2 << 2)) & 858993459)"
    s"(($m3 | ($m3 << 1)) & 1431655765)"
  }

  /** The same z-value as ANSI-ish SQL over integer columns (DuckDB
    * oracle form; identical constants/shifts as [[zValue]]).
    */
  def zValueSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
