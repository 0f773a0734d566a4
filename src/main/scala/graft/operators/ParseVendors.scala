package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vendor security-log parsers, family 2 (SURVEY.md §2.2): each is a bank of
  * codegen'd regexp_extract / split / to_timestamp expressions — no UDFs —
  * modeled on the reference's 13 vendor grok parsers
  * (/root/reference/src/parser/security_log/) and the sysmon CSV
  * positional parser (/root/reference/src/parser/sysmon_csv/).
  *
  * Timestamp semantics preserved from the reference:
  *  - wapples-style: naive local datetime hardcoded +0900 → UTC ns
  *    (wapples.rs:22-28)
  *  - ubuntu-style syslog: no year in the line; a pinned year is injected
  *    (ubuntu.rs:19-29 uses current year — nondeterministic by design; we pin
  *    via parameter for reproducibility, SURVEY.md §7.4.3)
  *  - sysmon: UTC "yyyy-MM-dd HH:mm:ss.SSS" (sysmon_csv.rs:310-327), hex
  *    0x logon_id via conv (process_create.rs:87-96), comma-split hash list
  *    (process_create.rs:113-120)
  */
object ParseVendors {

  val WapplesRe = "^\\[WAPPLES\\] time=\"([^\"]+)\" src=(\\S+) rule=(\\S+) act=(\\w+)$"
  val UbuntuRe = "^(\\w+ \\d+ \\d+:\\d+:\\d+) (\\S+) (\\w+)\\[(\\d+)\\]: (.*)$"

  private def nsOf(ts: Column): Column = unix_micros(ts) * lit(1000L)

  /** wapples-style: quoted local datetime, +0900 → UTC. */
  def wapples(line: Column): Column = {
    val t = regexp_extract(line, WapplesRe, 1)
    val ts = to_utc_timestamp(to_timestamp(t, "yyyy-MM-dd HH:mm:ss"), "+09:00")
    struct(
      nsOf(ts).as("ts_ns"),
      regexp_extract(line, WapplesRe, 2).as("src_ip"),
      regexp_extract(line, WapplesRe, 3).as("rule"),
      regexp_extract(line, WapplesRe, 4).as("action"),
      (regexp_extract(line, WapplesRe, 1) =!= "").as("ok"))
  }

  /** ubuntu-style syslog: month-name datetime without year; `pinYear` is
    * injected (the reference injects the current year — pinned here for
    * determinism). `serial` (1..999 per line) uniquifies same-second lines,
    * as the reference adds it to every security-log ts
    * (src/collector/security_log.rs:105-109).
    */
  def ubuntu(line: Column, serial: Column, pinYear: Int = 2025): Column = {
    val t = regexp_extract(line, UbuntuRe, 1)
    val ts = to_timestamp(concat(lit(s"$pinYear "), t), "yyyy MMM dd HH:mm:ss")
    struct(
      (nsOf(ts) + serial).as("ts_ns"),
      regexp_extract(line, UbuntuRe, 2).as("host"),
      regexp_extract(line, UbuntuRe, 3).as("daemon"),
      regexp_extract(line, UbuntuRe, 4).cast("int").as("pid"),
      regexp_extract(line, UbuntuRe, 5).as("contents"),
      (regexp_extract(line, UbuntuRe, 1) =!= "").as("ok"))
  }

  val DnsRe = "^(\\d+) q=(\\S+) answers=(\\S*) ttls=(\\S*) aa=([TF]) rd=([TF])$"

  /** Zeek-DNS-style line: comma-split string answers (Vec<String> —
    * reference network.rs:200-207), comma-split int TTLs (Vec<i32> —
    * network.rs:297-314), and T/F bool flags (network.rs:253-296).
    * `-` sentinel → empty arrays, matching the reference's default handling.
    */
  def dns(line: Column): Column = {
    val answers = regexp_extract(line, DnsRe, 3)
    val ttls = regexp_extract(line, DnsRe, 4)
    struct(
      (regexp_extract(line, DnsRe, 1).cast("long") * lit(1000000000L)).as("ts_ns"),
      regexp_extract(line, DnsRe, 2).as("query"),
      when(answers === "-" || answers === "", array().cast("array<string>"))
        .otherwise(split(answers, ",")).as("answers"),
      when(ttls === "-" || ttls === "", array().cast("array<int>"))
        .otherwise(transform(split(ttls, ","), _.cast("int"))).as("ttls"),
      (regexp_extract(line, DnsRe, 5) === "T").as("aa"),
      (regexp_extract(line, DnsRe, 6) === "T").as("rd"),
      (regexp_extract(line, DnsRe, 1) =!= "").as("ok"))
  }

  /** sysmon-style tab CSV (positional): UTC ms datetime, hex 0x id via conv,
    * comma-split hash array.
    */
  def sysmon(line: Column): Column = {
    val f = split(line, "\t")
    val ts = to_timestamp(element_at(f, 1), "yyyy-MM-dd HH:mm:ss.SSS")
    struct(
      nsOf(ts).as("ts_ns"),
      element_at(f, 2).as("provider"),
      element_at(f, 3).cast("int").as("event_code"),
      element_at(f, 4).as("image"),
      conv(regexp_replace(element_at(f, 5), "^0x", ""), 16, 10).cast("long").as("logon_id"),
      split(element_at(f, 6), ",").as("hashes"),
      (size(f) >= 6).as("ok"))
  }
}
