package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Parse, ParseVendors}

/** Fuzz property over every vendor parser and the core parse stage: on
  * ARBITRARY input lines (binary garbage, regex metacharacters, near-miss
  * prefixes, huge tokens, empty strings) a parser must never throw — it
  * marks `ok=false` / null fields and the row survives to be counted,
  * mirroring the reference's warn-log-and-continue contract
  * (/root/reference/src/collector/zeek.rs:118-139).
  */
class ParserFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def garbage: Seq[String] = {
    val weird = Gen.listOfN(60, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(30, Gen.chooseNum(0, 0x10FF)).map(_.map(_.toChar).mkString),
      Gen.oneOf("", " ", "\t", "date=", "date=notanumber srcip=999",
        "[x] nope", "<<<]][[(((", "\\d+\\s\\S", "%s%d%n",
        "9999999999999999999999999 INFO x", "0x", "a" * 5000)))
      // fixed seed: pureApply never returns None (unlike sample.get) and
      // every run fuzzes the identical corpus — failures reproduce
      .pureApply(Gen.Parameters.default, Seed(42L))
    weird ++ Seq("\u0000\u0001\u0002", "date=1700000000 srcip=", "-")
  }

  test("all 13 vendor parsers + oplog/dns/sysmon survive arbitrary garbage with ok=false") {
    val df = garbage.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("serial", "line").repartition(4)
    // named vendors with the (line, serial) signature
    ParseVendors.vendors.foreach { v =>
      val out = df.select(ParseVendors.secuLog(v)(col("line"), col("serial")).as("o"))
        .select(col("o.ok")).collect() // must not throw
      assert(out.length === garbage.length, s"${v.name}: rows lost")
    }
    // distinct-signature parsers
    val single = Seq(
      ParseVendors.wapples(col("line"), col("serial")),
      ParseVendors.dns(col("line")),
      ParseVendors.sysmon(col("line")),
      ParseVendors.ubuntu(col("line"), col("serial")))
    single.foreach { p =>
      val out = df.select(p.as("o")).select(col("o.ok")).collect()
      assert(out.length === garbage.length)
      assert(out.forall(!_.getBoolean(0)), "garbage must not parse ok")
    }
  }

  test("the core parse stage keeps and counts garbage rows instead of dropping them") {
    val raw = garbage.zipWithIndex.map { case (s, i) =>
      (f"doc-$i%012d", Seq(1, 2), 2, "src0", i.toLong, s, "oplog")
    }.toDF("doc_id", "tokens", "n_tok", "source", "line_no", "raw_line", "kind")
    val parsed = Parse.parsed(raw)
    assert(parsed.count() === garbage.length, "parse must not drop rows")
    assert(parsed.where(col("parse_ok")).count() === 0L)
  }
}
