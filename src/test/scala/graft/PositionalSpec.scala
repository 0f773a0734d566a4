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

  test("faithful families: 20 giganto + 14 sysmon + 12 zeek + 14 sysmon-csv, unique field names") {
    assert(Positional.giganto.size === 20)
    assert(Positional.sysmon14.size === 14)
    assert(Positional.zeekP.size === 12)
    assert(Positional.sysmonCsv.size === 14)
    (Positional.giganto ++ Positional.sysmon14 ++ Positional.zeekP ++ Positional.sysmonCsv)
      .foreach { p =>
        val names = p.fields.map(_.name)
        assert(names.distinct.size === names.size, s"${p.name} has duplicate field names")
      }
  }

  test("generator law: synth lines parse ok for every layout at arbitrary dids") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dids = Seq(0L, 1L, 7L, 96L, 97L, 999L, 123456L, 99999999L).toDF("did")
    val allProtos = Positional.giganto ++ Positional.sysmon14 ++
      Positional.zeekP ++ Positional.sysmonCsv
    // one job: every proto's ok-flag over every did, all in one projection
    val okCols = allProtos.map(p =>
      graft.operators.Positional.parser(p)(
        graft.operators.ProtoSynth.line(p, col("did")))("ok").as(p.name))
    val rows = dids.select(okCols: _*).collect()
    allProtos.zipWithIndex.foreach { case (p, i) =>
      assert(rows.forall(_.getBoolean(i)), s"${p.name} failed to parse some synth line")
    }
  }

  test("sysmon-csv types: ms timestamp and 0x hex id decode") {
    val p = Proto("t3", Seq(Field("ts_ns", PTsSysmonMs), Field("lid", PHexId)))
    val r = parse(p, "2023-01-10 00:00:00.250\t0x000ff")
    assert(r.getAs[Long]("ts_ns") === 1673308800250000000L)
    assert(r.getAs[Long]("lid") === 255L)
  }

  test("variable-width sec.frac: digit-scaled, not fixed-micros") {
    val p = Proto("t", Seq(Field("ts_ns", PTsSecMicros)))
    assert(parse(p, "1700000000.5").getAs[Long]("ts_ns") === 1700000000500000000L)
    assert(parse(p, "1700000000.123456789").getAs[Long]("ts_ns") === 1700000000123456789L)
    assert(parse(p, "1700000000.000001").getAs[Long]("ts_ns") === 1700000000000001000L)
  }

  test("new field types: rfc3339 ns, qclass/qtype mapping, word bools, tuples") {
    val p = Proto("t2", Seq(
      Field("st", PTsRfc3339), Field("qc", PQclass), Field("qt", PQtype),
      Field("b", PBoolWord), Field("cmds", PTuples)))
    val r = parse(p, "2023-01-10T00:00:00Z\tC_INTERNET\tAAAA\ttrue\t" +
      "(STOR,226,ok,true,10.0.0.1,10.0.0.2,2121,f1,100,id1)," +
      "(RETR,230,a,b,done,false,10.0.0.3,10.0.0.4,2020,g2,200,id2)")
    assert(r.getAs[Long]("st") === 1673308800000000000L)
    assert(r.getAs[Int]("qc") === 1 && r.getAs[Int]("qt") === 28)
    assert(r.getAs[Boolean]("b"))
    val cmds = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("cmds")
    assert(cmds.length === 2)
    assert(cmds(0).getAs[String]("command") === "STOR")
    assert(cmds(0).getAs[Boolean]("data_passive"))
    assert(cmds(0).getAs[Int]("data_resp_port") === 2121)
    assert(cmds(0).getAs[Long]("file_size") === 100L)
    // commas INSIDE reply_msg survive: first 2 fields split from the front,
    // last 7 from the back, the middle is one field (network.rs:1621-1692)
    assert(cmds(1).getAs[String]("reply_msg") === "a,b,done")
    assert(cmds(1).getAs[String]("file_id") === "id2")
    val s = parse(p, "2023-01-10T00:00:00Z\tC_CHAOS\tBOGUS\tfalse\t-")
    assert(s.getAs[Int]("qc") === 0 && s.getAs[Int]("qt") === 0)
    assert(!s.getAs[Boolean]("b"))
    assert(s.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("cmds").isEmpty) // '-' → []
    // a tuple with fewer than the 10 required fields is dropped, not fatal
    val m = parse(p, "2023-01-10T00:00:00Z\tC_INTERNET\tA\ttrue\t(a,b),(c,d)")
    assert(m.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("cmds").isEmpty)
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
