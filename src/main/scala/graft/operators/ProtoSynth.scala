package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Positional._

/** Deterministic per-field synthesis + DuckDB oracle twins for the
  * [[Positional]] layout families.
  *
  * For every field type there are two generators driven by the same integer
  * arithmetic over `did` (the document id) and the field's ordinal `i`:
  *
  *  - [[raw]] emits the TEXT that would appear in the TSV record — the
  *    pipeline parses this with [[Positional.parser]], exactly as the
  *    reference parses a giganto-export/zeek/sysmon line;
  *  - [[parsedSql]] emits DuckDB SQL computing the PARSED value directly
  *    from `did` — an independent arithmetic re-derivation, so a Spark-side
  *    parse bug cannot self-confirm through the oracle.
  *
  * The ordinal decorrelates fields of the same type within a record, and
  * sentinel rows (`-`) are injected on type-specific moduli so every
  * sentinel default in [[Positional.conv]] is exercised per protocol.
  * Timestamp fractions cycle through widths 1..9 digits per row, covering
  * the reference's variable-width `sec.frac` decode
  * (/root/reference/src/parser/giganto_import.rs:28-47).
  */
object ProtoSynth {

  private def istr(c: Column): Column = c.cast("string")

  // RFC3339 datetime components — twins of Oracles.V2Cte (mo/dy/hh/mi/ss)
  private def mo(did: Column) = lpad(istr(lit(1) + did % 12), 2, "0")
  private def dy(did: Column) = lpad(istr(lit(10) + did % 19), 2, "0")
  private def hh(did: Column) = lpad(istr(did % 24), 2, "0")
  private def mi(did: Column) = lpad(istr(did % 60), 2, "0")
  private def ss(did: Column) = lpad(istr((did * 7) % 60), 2, "0")

  /** Raw TSV field text for field ordinal `i` of type `t`. */
  def raw(t: FType, i: Int, did: Column): Column = t match {
    case PTsSecMicros =>
      // sec.frac with frac width cycling 1..9: take the leading `fw` digits
      // of a 9-digit zero-padded stream so the parsed value is
      // sec·1e9 + frac·10^(9−fw)
      val sec = lit(1700000000L) + did % 1000L
      val fw = (did % 9L + 1L).cast("int")
      val full9 = lpad(istr((did * 1000003L) % 1000000000L), 9, "0")
      concat(istr(sec), lit("."), full9.substr(lit(1), fw))
    case PTsRfc3339 =>
      concat(lit("2023-"), mo(did), lit("-"), dy(did), lit("T"),
        hh(did), lit(":"), mi(did), lit(":"), ss(did), lit("Z"))
    case PIp =>
      concat(lit("10."), istr((did + i * 37) % 250L), lit(".0."), istr(did % 200L + 1L))
    case PStr =>
      when((did + i) % 11 === 0, lit("-"))
        .otherwise(concat(lit(s"s${i}x"), istr((did * (i + 2)) % 50L)))
    case PInt  => istr((did * (i + 3)) % 250L)
    case PLong => istr((did * (i + 7)) % 1000000L)
    case PBool => when((did + i) % 2 === 0, lit("T")).otherwise(lit("F"))
    case PBoolWord => when((did + i) % 2 === 0, lit("true")).otherwise(lit("false"))
    case PStrArr =>
      when((did + i) % 7 === 0, lit("-"))
        .otherwise(concat(lit("a"), istr(did % 9L), lit(",b"), istr((did + i) % 9L)))
    case PIntArr =>
      when((did + i) % 7 === 0, lit("-"))
        .otherwise(concat(istr(did % 100L), lit(","), istr((did + i) % 100L)))
    case PQclass => when(did % 3 === 0, lit("C_CHAOS")).otherwise(lit("C_INTERNET"))
    case PQtype =>
      // cycle through the ENTIRE qtype table plus one unknown name, so
      // every rare code (NAPTR/DS/RRSIG/…) and the fall-through-to-0 arm
      // are exercised per protocol
      val names = QtypeCodes.map(_._1) :+ "BOGUS"
      element_at(array(names.map(lit): _*),
        ((did + i) % names.length).cast("int") + 1)
    case PDurSecs =>
      when(did % 5 === 0, lit("-")).otherwise(concat(istr(did % 100L), lit(".5")))
    case PTuples =>
      when((did + i) % 3 === 0, lit("-")).otherwise(concat(
        lit("(STOR,226,ok,true,10.0.0.1,10.0.0.2,2121,f"), istr(did % 9L),
        lit(",100,id"), istr(did % 9L),
        lit("),(RETR,230,done,false,10.0.0.3,10.0.0.4,2020,g"), istr((did + i) % 9L),
        lit(",200,id2)")))
    case PTsSysmonMs =>
      concat(lit("2023-"), mo(did), lit("-"), dy(did), lit(" "),
        hh(did), lit(":"), mi(did), lit(":"), ss(did), lit("."),
        lpad(istr(did % 1000L), 3, "0"))
    case PHexId =>
      // decimal digits read as base-16, the p18/reference hex-conv shape
      concat(lit("0x"), lpad(istr(did % 100000L), 5, "0"))
  }

  /** DuckDB SQL (over alias `did`, plus `mo/dy/hh/mi/ss` from V2Cte) for the
    * PARSED value(s) of the field: Seq of (outputName, sqlExpr). Arrays are
    * emitted csv-encoded; tuple blobs emit (raw, count).
    */
  def parsedSql(t: FType, i: Int, name: String): Seq[(String, String)] = t match {
    case PTsSecMicros => Seq(name ->
      ("(1700000000 + did%1000)*1000000000 + " +
        "cast(substr(lpad(cast((did*1000003)%1000000000 AS varchar),9,'0'),1,cast(did%9+1 AS int)) AS bigint)" +
        " * cast(pow(10, 9-(did%9+1)) AS bigint)"))
    case PTsRfc3339 => Seq(name ->
      "epoch_us(make_timestamp(2023, mo, dy, hh, mi, cast(ss AS double)))*1000")
    case PIp => Seq(name ->
      s"'10.' || cast((did + ${i * 37}) % 250 AS varchar) || '.0.' || cast(did % 200 + 1 AS varchar)")
    case PStr => Seq(name ->
      s"CASE WHEN (did + $i) % 11 = 0 THEN '' ELSE 's${i}x' || cast((did * ${i + 2}) % 50 AS varchar) END")
    case PInt  => Seq(name -> s"cast((did * ${i + 3}) % 250 AS int)")
    case PLong => Seq(name -> s"(did * ${i + 7}) % 1000000")
    case PBool => Seq(name -> s"(did + $i) % 2 = 0")
    case PBoolWord => Seq(name -> s"(did + $i) % 2 = 0")
    case PStrArr => Seq(s"${name}_csv" ->
      s"CASE WHEN (did + $i) % 7 = 0 THEN '' ELSE 'a' || cast(did % 9 AS varchar) || ',b' || cast((did + $i) % 9 AS varchar) END")
    case PIntArr => Seq(s"${name}_csv" ->
      s"CASE WHEN (did + $i) % 7 = 0 THEN '' ELSE cast(did % 100 AS varchar) || ',' || cast((did + $i) % 100 AS varchar) END")
    case PQclass => Seq(name -> "cast(CASE WHEN did % 3 = 0 THEN 0 ELSE 1 END AS int)")
    case PQtype =>
      val codes = QtypeCodes.map(_._2) :+ 0
      val arms = codes.zipWithIndex.map { case (c, k) => s"WHEN $k THEN $c" }.mkString(" ")
      Seq(name -> s"cast(CASE (did + $i) % ${codes.length} $arms END AS int)")
    case PDurSecs => Seq(name ->
      "CASE WHEN did % 5 = 0 THEN 0 ELSE (did % 100)*1000000000 + 500000000 END")
    case PTsSysmonMs => Seq(name ->
      "(epoch_us(make_timestamp(2023, mo, dy, hh, mi, cast(ss AS double))) + (did % 1000)*1000)*1000")
    case PHexId =>
      val fold = (1 to 5).foldLeft("cast(0 AS bigint)") { (acc, k) =>
        s"($acc*16 + (ascii(substr(lpad(cast(did % 100000 AS varchar),5,'0'),$k,1))-48))"
      }
      Seq(name -> fold)
    case PTuples => Seq(
      // flattened struct fields, |-joined within a tuple, ;-joined across
      // tuples — derived arithmetically (NOT by re-splitting the raw blob),
      // so a structural-parse bug cannot self-confirm
      s"${name}_csv" ->
        (s"CASE WHEN (did + $i) % 3 = 0 THEN '' ELSE " +
          "'STOR|226|ok|true|10.0.0.1|10.0.0.2|2121|f' || cast(did % 9 AS varchar) || " +
          "'|100|id' || cast(did % 9 AS varchar) || " +
          s"';RETR|230|done|false|10.0.0.3|10.0.0.4|2020|g' || cast((did + $i) % 9 AS varchar) || " +
          "'|200|id2' END"),
      s"${name}_cnt" -> s"cast(CASE WHEN (did + $i) % 3 = 0 THEN 0 ELSE 2 END AS int)")
  }

  /** Spark output projection for a parsed struct field: arrays go out as
    * csv, tuple-struct arrays flattened (every typed struct field read back
    * out, |-joined within a tuple, ;-joined across) — same names as the SQL
    * side so the gate's sorted-column hash lines up.
    */
  def outCols(t: FType, name: String, o: Column): Seq[Column] = t match {
    case PStrArr | PIntArr => Seq(concat_ws(",", o).as(s"${name}_csv"))
    case PTuples => Seq(
      array_join(transform(o, tup => concat_ws("|",
        tup.getField("command"), tup.getField("reply_code"),
        tup.getField("reply_msg"), tup.getField("data_passive").cast("string"),
        tup.getField("data_orig_addr"), tup.getField("data_resp_addr"),
        tup.getField("data_resp_port").cast("string"), tup.getField("file"),
        tup.getField("file_size").cast("string"), tup.getField("file_id"))),
        ";").as(s"${name}_csv"),
      size(o).as(s"${name}_cnt"))
    case _ => Seq(o.as(name))
  }

  /** Build the full synthetic TSV line for a protocol. */
  def line(proto: Proto, did: Column): Column =
    concat_ws(proto.sep,
      proto.fields.zipWithIndex.map { case (f, i) => raw(f.t, i, did) }: _*)

  /** Parse the synthetic line and project every field (plus doc_id).
    *
    * The split-parts array goes through its OWN projection step so each
    * field's conv expression references a 1-node attribute, not a private
    * copy of the whole split(concat_ws(...)) subtree — same values, but
    * the eagerly-analyzed tree shrinks ~20× (measured 1.3 s → ~0.1 s of
    * driver time per proto query; CollapseProject will not re-inline a
    * non-cheap expression consumed by every field).
    */
  def query(proto: Proto)(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val parts = split(line(proto, col("did")),
      java.util.regex.Pattern.quote(proto.sep))
    val o = Positional.fromParts(proto)(col("__parts"))
    df.select(col("doc_id"), parts.as("__parts"))
      .select(col("doc_id"), o.as("o"))
      .where(col("o.ok"))
      .select(col("doc_id") +:
        proto.fields.flatMap(f => outCols(f.t, f.name, col(s"o.${f.name}"))): _*)
  }

  /** The protocol's DuckDB oracle body (to be wrapped with V2Cte). */
  def oracleBody(proto: Proto): String = {
    val cols = proto.fields.zipWithIndex.flatMap { case (f, i) =>
      parsedSql(f.t, i, f.name).map { case (n, sql) => s"  $sql AS $n" }
    }
    "SELECT doc_id,\n" + cols.mkString(",\n") + "\nFROM v2"
  }
}
