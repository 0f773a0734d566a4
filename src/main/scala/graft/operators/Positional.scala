package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative positional-parser generator: a protocol is a field list
  * (name, type, position); the generator emits the same bank of codegen'd
  * split/cast/sentinel expressions a hand-written parser would.
  *
  * This is the engine-side generalization of the reference's 21 per-protocol
  * `try_from_giganto_record` impls
  * (/root/reference/src/parser/giganto_import/network.rs — Conn, Dns, Http,
  * Smtp, Ntlm, Ssh, Mqtt, Bootp, …): every impl is the same positional
  * extract → cast → `-`-sentinel default → struct pattern, so the schema is
  * data, not code. Sentinel semantics follow the reference: `-` → 0 /
  * empty string / empty array (giganto_import.rs:59-75).
  */
object Positional {

  sealed trait FType
  case object PStr extends FType
  case object PInt extends FType
  case object PLong extends FType
  case object PBool extends FType            // T/F flags
  case object PTsSecMicros extends FType     // sec.micros → ns
  case object PDurSecs extends FType         // float seconds → rounded ns
  case object PStrArr extends FType          // comma-split strings
  case object PIntArr extends FType          // comma-split ints

  final case class Field(name: String, t: FType)

  /** A protocol = ordered field list over a separated record. */
  final case class Proto(name: String, fields: Seq[Field], sep: String = "\t") {
    def minWidth: Int = fields.length
  }

  private def conv(raw: Column, t: FType): Column = t match {
    case PStr  => when(raw === "-", lit("")).otherwise(raw)
    case PInt  => when(raw === "-", lit(0)).otherwise(raw.cast("int"))
    case PLong => when(raw === "-", lit(0L)).otherwise(raw.cast("long"))
    case PBool => raw === "T"
    case PTsSecMicros =>
      // fraction may be any width (Zeek/giganto timestamps carry variable
      // digits); scale by digit count — '1700000000.5' is 500,000,000 ns,
      // not 5,000
      val p = split(raw, "\\.")
      val frac = element_at(p, 2)
      element_at(p, 1).cast("long") * lit(1000000000L) +
        coalesce(frac.cast("long") *
          pow(lit(10.0), lit(9) - length(frac)).cast("long"), lit(0L))
    case PDurSecs =>
      when(raw === "-", lit(0L)).otherwise(round(raw.cast("double") * lit(1e9)).cast("long"))
    case PStrArr =>
      when(raw === "-" || raw === "", array().cast("array<string>")).otherwise(split(raw, ","))
    case PIntArr =>
      when(raw === "-" || raw === "", array().cast("array<int>"))
        .otherwise(transform(split(raw, ","), _.cast("int")))
  }

  /** Generate the parse expression for a protocol: struct of typed fields
    * plus `ok` (width check — short rows fail closed, reference
    * drop-and-count).
    */
  def parser(proto: Proto)(line: Column): Column = {
    val f = split(line, java.util.regex.Pattern.quote(proto.sep))
    val cols = proto.fields.zipWithIndex.map { case (fld, i) =>
      conv(element_at(f, i + 1), fld.t).as(fld.name)
    }
    struct(cols :+ (size(f) >= proto.minWidth).as("ok"): _*)
  }

  // --- protocol registry (field layouts mirroring the reference's structs;
  //     construction sites cited per protocol) ---

  /** Conn — giganto_import/network.rs:23 (ts, addrs/ports, proto, duration,
    * byte/packet counters).
    */
  val Conn: Proto = Proto("conn", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("proto", PStr),
    Field("duration_ns", PDurSecs), Field("orig_bytes", PLong), Field("resp_bytes", PLong),
    Field("orig_pkts", PLong), Field("resp_pkts", PLong)))

  /** Http — network.rs:495 (method/host/uri/status + body sizes). */
  val Http: Proto = Proto("http", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("method", PStr),
    Field("host", PStr), Field("uri", PStr), Field("status_code", PInt),
    Field("request_len", PLong), Field("response_len", PLong)))

  /** Smtp — network.rs:819 (mailfrom/from/to/subject/agent). */
  val Smtp: Proto = Proto("smtp", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("mailfrom", PStr),
    Field("date", PStr), Field("from", PStr), Field("to", PStrArr),
    Field("subject", PStr), Field("agent", PStr)))

  /** Ssh — network.rs:955 (version/auth attempts/algorithms). */
  val Ssh: Proto = Proto("ssh", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("client", PStr),
    Field("server", PStr), Field("auth_success", PBool), Field("auth_attempts", PInt),
    Field("cipher_alg", PStr)))

  /** Ntlm — network.rs:716 (user/host/domain + success flag). */
  val Ntlm: Proto = Proto("ntlm", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("username", PStr),
    Field("hostname", PStr), Field("domainname", PStr), Field("success", PBool)))

  /** Mqtt — network.rs:2224 (protocol/version/client id/topics). */
  val Mqtt: Proto = Proto("mqtt", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("protocol", PStr),
    Field("version", PInt), Field("client_id", PStr), Field("subscribe", PStrArr)))

  /** Bootp — network.rs:2966 (op/htype/hops/ciaddr/yiaddr/chaddr). */
  val Bootp: Proto = Proto("bootp", Seq(
    Field("ts_ns", PTsSecMicros), Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt), Field("op", PInt),
    Field("htype", PInt), Field("hops", PInt), Field("ciaddr", PStr),
    Field("yiaddr", PStr), Field("chaddr", PStr)))

  // --- sysmon event-type layouts (giganto_import/sysmon.rs:63-543; the
  //     reference registers 14 such kinds, each the same positional pattern) ---

  /** ProcessCreate (event 1) — sysmon.rs:63. */
  val SysmonProcessCreate: Proto = Proto("sysmon_process_create", Seq(
    Field("ts_ns", PTsSecMicros), Field("agent_name", PStr), Field("agent_id", PStr),
    Field("process_guid", PStr), Field("process_id", PInt), Field("image", PStr),
    Field("command_line", PStr), Field("user", PStr), Field("logon_id", PLong),
    Field("hashes", PStrArr), Field("parent_process_id", PInt), Field("parent_image", PStr)))

  /** NetworkConnect (event 3) — sysmon.rs:~170. */
  val SysmonNetworkConnect: Proto = Proto("sysmon_network_connect", Seq(
    Field("ts_ns", PTsSecMicros), Field("agent_name", PStr), Field("agent_id", PStr),
    Field("process_guid", PStr), Field("process_id", PInt), Field("image", PStr),
    Field("protocol", PStr), Field("initiated", PBool),
    Field("src_ip", PStr), Field("src_port", PInt),
    Field("dst_ip", PStr), Field("dst_port", PInt)))

  /** FileCreate (event 11). */
  val SysmonFileCreate: Proto = Proto("sysmon_file_create", Seq(
    Field("ts_ns", PTsSecMicros), Field("agent_name", PStr), Field("agent_id", PStr),
    Field("process_guid", PStr), Field("process_id", PInt), Field("image", PStr),
    Field("target_filename", PStr), Field("creation_utc_time_ns", PLong)))

  /** RegistryValueSet (event 13). */
  val SysmonRegistryValueSet: Proto = Proto("sysmon_registry_value_set", Seq(
    Field("ts_ns", PTsSecMicros), Field("agent_name", PStr), Field("agent_id", PStr),
    Field("event_type", PStr), Field("process_guid", PStr), Field("process_id", PInt),
    Field("image", PStr), Field("target_object", PStr), Field("details", PStr)))

  /** DnsQuery (event 22) — string-array results like the reference's. */
  val SysmonDnsQuery: Proto = Proto("sysmon_dns_query", Seq(
    Field("ts_ns", PTsSecMicros), Field("agent_name", PStr), Field("agent_id", PStr),
    Field("process_guid", PStr), Field("process_id", PInt), Field("query_name", PStr),
    Field("query_status", PInt), Field("query_results", PStrArr), Field("image", PStr)))

  val registry: Map[String, Proto] =
    Seq(Conn, Http, Smtp, Ssh, Ntlm, Mqtt, Bootp,
      SysmonProcessCreate, SysmonNetworkConnect, SysmonFileCreate,
      SysmonRegistryValueSet, SysmonDnsQuery).map(p => p.name -> p).toMap
}
