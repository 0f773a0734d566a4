package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.BinaryDecode

/** Render-class fidelity against the reference's parse_data
  * (/root/reference/src/parser/netflow/packet.rs:568-625 and its tests:
  * tcp_flags "SYN-ACK"/"None", text "abc", odd-width integer "0") plus
  * Rust Ipv6Addr Display semantics (RFC 5952) for the Ipv6 kind.
  */
class V9RenderSpec extends SparkSpec {

  private def eval(c: Column): String =
    spark.range(1).select(c.as("r")).collect()(0).getString(0)

  test("TcpFlags: '-'-joined table order, None when empty, PSH-CWR share 0x08") {
    assert(eval(BinaryDecode.v9TcpFlagsString(lit(0x12L))) === "SYN-ACK")
    assert(eval(BinaryDecode.v9TcpFlagsString(lit(0L))) === "None")
    assert(eval(BinaryDecode.v9TcpFlagsString(lit(0x08L))) === "PSH-CWR")
    // 0x80 has no table row — renders None, not a phantom flag
    assert(eval(BinaryDecode.v9TcpFlagsString(lit(0x80L))) === "None")
  }

  test("Text: printable prefix before the first terminator; no terminator → '-'") {
    assert(eval(BinaryDecode.v9TextString(lit("61626300"))) === "abc")
    assert(eval(BinaryDecode.v9TextString(lit("73616d70"))) === "-") // all printable
    assert(eval(BinaryDecode.v9TextString(lit(""))) === "-")
    assert(eval(BinaryDecode.v9TextString(lit("0041"))) === "") // non-printable first
  }

  test("Ipv6: RFC-5952 compression — longest run, leftmost tie, mapped form") {
    def ip6(groups: Seq[Int]): Column =
      lit(groups.map(g => f"$g%04x").mkString)
    assert(eval(BinaryDecode.ipv6String(ip6(
      Seq(0x2001, 0xdb8, 0, 0, 0, 0, 0, 1)))) === "2001:db8::1")
    assert(eval(BinaryDecode.ipv6String(ip6(Seq(0, 0, 0, 0, 0, 0, 0, 0)))) === "::")
    assert(eval(BinaryDecode.ipv6String(ip6(Seq(0, 0, 0, 0, 0, 0, 0, 1)))) === "::1")
    // a SINGLE zero group is not compressed
    assert(eval(BinaryDecode.ipv6String(ip6(
      Seq(0x2001, 0xdb8, 0, 1, 1, 1, 1, 1)))) === "2001:db8:0:1:1:1:1:1")
    // leftmost wins among equal-length runs; a longer run beats an earlier
    // shorter one
    assert(eval(BinaryDecode.ipv6String(ip6(
      Seq(1, 0, 0, 1, 0, 0, 1, 1)))) === "1::1:0:0:1:1")
    assert(eval(BinaryDecode.ipv6String(ip6(
      Seq(1, 0, 0, 1, 0, 0, 0, 1)))) === "1:0:0:1::1")
    // IPv4-mapped special case (Rust Display)
    assert(eval(BinaryDecode.ipv6String(ip6(
      Seq(0, 0, 0, 0, 0, 0xffff, 0xc0a8, 1)))) === "::ffff:192.168.0.1")
  }

  test("Ascii (options scope fields): lowercase unpadded hex for 1/2/4/8-byte widths, else '0'") {
    assert(eval(BinaryDecode.v9AsciiString(lit(0xaaL), lit("00aa"))) === "aa")
    assert(eval(BinaryDecode.v9AsciiString(lit(0L), lit("010203"))) === "0")
  }

  test("Integer render honors wire width: odd widths render '0'") {
    assert(eval(BinaryDecode.v9Render(lit(999), lit(66051L), lit("010203"))) === "0")
    assert(eval(BinaryDecode.v9Render(lit(999), lit(258L), lit("0102"))) === "258")
    // unknown ForwardingStatus → decimal, not a synthetic label
    assert(eval(BinaryDecode.v9Render(lit(89), lit(77L), lit("4d"))) === "77")
  }
}
