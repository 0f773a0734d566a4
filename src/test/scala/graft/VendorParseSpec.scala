package graft

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.functions._

import graft.operators.{BinaryDecode, ParseVendors}

/** Reference-style exact-value parse tests (SURVEY §5): one hand-written
  * line per format, expected timestamps cross-checked against java.time
  * (the reference cross-checks against chrono — e.g. wapples.rs:155).
  */
class VendorParseSpec extends SparkSpec {
  import spark.implicits._

  private def ns(dt: String, plusNanos: Long = 0L): Long =
    LocalDateTime.parse(dt).toEpochSecond(ZoneOffset.UTC) * 1000000000L + plusNanos

  test("wapples: quoted KST datetime shifts -9h to UTC ns; fields extracted") {
    val line = """[WAPPLES] time="2023-03-15 07:26:09" src=10.1.1.42 rule=r7 act=block"""
    val r = Seq(line).toDF("l").select(ParseVendors.wapples($"l").as("o"))
      .select("o.*").as[(Long, String, String, String, Boolean)].head()
    assert(r._1 === ns("2023-03-15T07:26:09") - 9L * 3600 * 1000000000L)
    assert(r === ((r._1, "10.1.1.42", "r7", "block", true)))
  }

  test("ubuntu syslog: month name + injected year + serial; fields extracted") {
    val line = "Oct 15 04:05:06 host3 sshd[812]: Failed password for user9 from 10.0.0.5"
    val r = Seq(line).toDF("l")
      .select(ParseVendors.ubuntu($"l", lit(37L), pinYear = 2025).as("o"))
      .select("o.ts_ns", "o.host", "o.daemon", "o.pid", "o.contents")
      .as[(Long, String, String, Int, String)].head()
    assert(r._1 === ns("2025-10-15T04:05:06") + 37L)
    assert(r._2 === "host3" && r._3 === "sshd" && r._4 === 812)
    assert(r._5 === "Failed password for user9 from 10.0.0.5")
  }

  test("sysmon CSV: ms datetime, hex 0x logon via conv, comma-split hashes") {
    val line = "2023-10-15 04:05:06.123\tMicrosoft-Windows-Sysmon\t1\tproc7.exe\t0x3e8\tSHA1=abc,MD5=def"
    val r = Seq(line).toDF("l").select(ParseVendors.sysmon($"l").as("o"))
      .select("o.ts_ns", "o.event_code", "o.image", "o.logon_id", "o.hashes")
      .as[(Long, Int, String, Long, Seq[String])].head()
    assert(r._1 === ns("2023-10-15T04:05:06", 123000000L))
    assert(r._2 === 1 && r._3 === "proc7.exe")
    assert(r._4 === 0x3e8L) // 1000
    assert(r._5 === Seq("SHA1=abc", "MD5=def"))
  }

  test("dns: '-' sentinel -> empty arrays; T/F bools; int TTLs") {
    val full = "1700000500 q=host1.example.com answers=10.0.0.1,10.0.1.2 ttls=60,120 aa=T rd=F"
    val dash = "1700000500 q=host2.example.com answers=- ttls=- aa=F rd=T"
    val rows = Seq(full, dash).toDF("l").select(ParseVendors.dns($"l").as("o"))
      .select("o.query", "o.answers", "o.ttls", "o.aa", "o.rd")
      .as[(String, Seq[String], Seq[Int], Boolean, Boolean)].collect()
    assert(rows(0) === (("host1.example.com", Seq("10.0.0.1", "10.0.1.2"), Seq(60, 120), true, false)))
    assert(rows(1) === (("host2.example.com", Seq.empty, Seq.empty, false, true)))
  }

  test("netflow v5 binary: big-endian fields decode from raw bytes") {
    // version=5, count=1, uptime=0x0001e240 (123456), secs=0x655fa1c0,
    // srcaddr=10.1.2.3 = 0x0a010203, sport=0x1f90 (8080), dport=0x01bb (443),
    // octets=0x000f4240 (1000000)
    val hexStr = "0005" + "0001" + "0001e240" + "655fa1c0" + "0a010203" + "1f90" + "01bb" + "000f4240"
    val r = Seq(hexStr).toDF("h")
      .select(BinaryDecode.netflowV5(unhex($"h")).as("o"))
      .select("o.version", "o.flow_count", "o.sys_uptime", "o.unix_secs",
        "o.srcaddr", "o.src_port", "o.dst_port", "o.d_octets", "o.ok")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(r === ((5L, 1L, 123456L, 0x655fa1c0L, 0x0a010203L, 8080L, 443L, 1000000L, true)))
    // and the dotted-quad rendering
    val ip = Seq(0x0a010203L).toDF("a").select(BinaryDecode.ipv4String($"a")).as[String].head()
    assert(ip === "10.1.2.3")
  }

  test("non-matching lines fail closed (ok=false), never throw") {
    val junk = Seq("garbage", "", "[WAPPLES] nope").toDF("l")
    val oks = junk.select(
      ParseVendors.wapples($"l")("ok").as("w"),
      ParseVendors.ubuntu($"l", lit(1L))("ok").as("u"),
      ParseVendors.dns($"l")("ok").as("d"))
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(oks.forall(t => !t._1 && !t._2 && !t._3))
  }
}
