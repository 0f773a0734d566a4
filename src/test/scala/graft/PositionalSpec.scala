package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Positional
import graft.operators.Positional._

/** Schema-driven positional parser: exact field decode per protocol,
  * '-' sentinel defaults per type, short rows fail closed — the laws every
  * of the reference's 21 hand-written giganto-import parsers satisfies.
  */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  private def parse(proto: Proto, line: String): Row =
    Seq(line).toDF("l").select(Positional.parser(proto)($"l").as("o"))
      .select("o.*").head()

  test("conn: exact decode incl. sec.micros ts and '-' duration sentinel") {
    val r = parse(Conn, "1700000500.250000\t10.1.1.1\t5555\t10.0.0.2\t443\ttcp\t-\t100\t200\t3\t4")
    assert(r.getAs[Long]("ts_ns") === 1700000500250000000L)
    assert(r.getAs[Long]("duration_ns") === 0L)
    assert(r.getAs[Long]("orig_bytes") === 100L && r.getAs[Long]("resp_pkts") === 4L)
    assert(r.getAs[Boolean]("ok"))
  }

  test("ssh: T/F bool and int fields") {
    val r = parse(Ssh, "1700000500.000000\t10.1.1.1\t22\t10.0.0.2\t22\tOpenSSH_8\tOpenSSH_9\tT\t3\taes256")
    assert(r.getAs[Boolean]("auth_success"))
    assert(r.getAs[Int]("auth_attempts") === 3)
  }

  test("smtp/mqtt: '-' string-array sentinel → empty array; csv splits") {
    val s = parse(Smtp, "1700000500.000000\t10.0.0.3\t25\t10.0.0.4\t25\tmf\t-\tfrom1\tx@a,y@b\tsub\tagent")
    assert(s.getAs[Seq[String]]("to") === Seq("x@a", "y@b"))
    assert(s.getAs[String]("date") === "") // '-' → empty string
    val m = parse(Mqtt, "1700000500.000000\t10.0.0.3\t1883\t10.0.0.4\t1883\tmqtt\t4\tcli1\t-")
    assert(m.getAs[Seq[String]]("subscribe") === Seq.empty)
  }

  test("short rows fail closed for every registry protocol") {
    Positional.registry.values.foreach { proto =>
      val r = parse(proto, "1700000500.000000\tonly\ttwo")
      assert(!r.getAs[Boolean]("ok"), s"${proto.name} must fail closed")
    }
  }

  test("registry covers 12 protocols with distinct layouts") {
    assert(Positional.registry.size === 12)
    assert(Positional.registry.values.map(_.fields.map(_.name)).toSet.size === 12)
  }

  test("sysmon layouts: bool initiated, string-array dns results, hashes") {
    val n = parse(SysmonNetworkConnect,
      "1700000500.000000\tagent1\tid1\tguid1\t42\tproc.exe\ttcp\tT\t10.1.1.1\t5555\t10.0.0.2\t443")
    assert(n.getAs[Boolean]("initiated") && n.getAs[Int]("dst_port") === 443)
    val d = parse(SysmonDnsQuery,
      "1700000500.000000\tagent1\tid1\tguid1\t42\texample.com\t0\t10.0.0.1,10.0.0.2\tproc.exe")
    assert(d.getAs[Seq[String]]("query_results") === Seq("10.0.0.1", "10.0.0.2"))
    val p = parse(SysmonProcessCreate,
      "1700000500.000000\tagent1\tid1\tguid1\t42\tproc.exe\tcmd /c x\tuser1\t1000\tSHA1=a,MD5=b\t7\tparent.exe")
    assert(p.getAs[Long]("logon_id") === 1000L)
    assert(p.getAs[Seq[String]]("hashes") === Seq("SHA1=a", "MD5=b"))
  }
}
