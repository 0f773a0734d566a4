package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary packet decode with pure Catalyst byte-slicing — the Spark
  * re-expression of the reference's NetFlow v5 header/record decode
  * (/root/reference/src/parser/netflow/packet.rs:265-303 header,
  * :402-463 v5 records). substring over BinaryType + hex + conv(16,10)
  * decodes big-endian unsigned fields without any UDF; every expression is
  * whole-stage-codegen'd, so at scale this is a single fused pass over the
  * packet bytes.
  */
object BinaryDecode {

  /** Big-endian unsigned int from `len` bytes at 1-based byte offset `pos`. */
  def beUint(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast("long")

  /** NetFlow-v5-style packet: header (version u16, count u16, uptime u32,
    * unix_secs u32) + first record (srcaddr u32, srcport u16, dstport u16,
    * d_octets u32).
    */
  def netflowV5(packet: Column): Column = struct(
    beUint(packet, 1, 2).as("version"),
    beUint(packet, 3, 2).as("flow_count"),
    beUint(packet, 5, 4).as("sys_uptime"),
    beUint(packet, 9, 4).as("unix_secs"),
    beUint(packet, 13, 4).as("srcaddr"),
    beUint(packet, 17, 2).as("src_port"),
    beUint(packet, 19, 2).as("dst_port"),
    beUint(packet, 21, 4).as("d_octets"),
    (beUint(packet, 1, 2) === 5L && length(packet) >= 24).as("ok"))

  /** Dotted-quad string from a u32 address (reference renders IpAddr —
    * src/parser/netflow/fields.rs).
    */
  def ipv4String(addr: Column): Column = concat_ws(".",
    (addr / 16777216L).cast("long") % 256L,
    (addr / 65536L).cast("long") % 256L,
    (addr / 256L).cast("long") % 256L,
    addr % 256L)
}
