package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftleft}

/** Z-order (Morton) interleaving for multi-dimensional data clustering —
  * the file-layout lever behind min/max data skipping at 100 TB: sorting
  * by z-value before writing gives EVERY interleaved dimension a narrow
  * min/max range per file, so a predicate on any of them prunes most
  * files from the scan, where a plain sort clusters only its leading
  * column and leaves the others spanning the full domain per file.
  *
  * zorder2 interleaves the low 16 bits of two columns (higher bits are
  * masked off) into a 32-bit z-value via the classic mask-and-spread
  * ladder. 16 bits per dimension = 65,536 distinct clusters per axis —
  * far finer than any realistic file count — so callers bucketize or mod
  * raw keys into that range first. All steps are plain integer and/or/
  * shift expressions: codegen'd, ANSI-safe (bitwise ops never overflow-
  * check), and reproducible bit-for-bit in any engine (the q91 DuckDB
  * oracle runs the same ladder).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` into the even bit positions. */
  def spread16(c: Column): Column = {
    val v = c.bitwiseAND(lit(65535L))
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(16711935L))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit z-value of (x, y): x in even bits, y in odd bits. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread ladder as DuckDB SQL (oracle twin). */
  def duckSpread16(e: String): String = {
    val v = s"(($e) & 65535)"
    val a = s"(($v | ($v << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val d = s"(($b | ($b << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  def duckZorder2(x: String, y: String): String =
    s"(${duckSpread16(x)} | (${duckSpread16(y)} << 1))"
}
