package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers + deterministic derivations over the driver-generated testdata.
  *
  * The north-rule input is a table of pre-tokenized sequences
  * `(doc_id string, tokens array<int>, n_tok int, source string)`. We derive
  * it deterministically from `documents.parquet` with expressions that have
  * exact DuckDB equivalents (see [[graft.Oracles]]), so the driver's oracle
  * can re-derive the same table: every function used here (split, ascii,
  * length, lpad, %, floor) is pure integer/string arithmetic with identical
  * semantics in both engines.
  *
  * The synthetic `raw_line` column reconstructs the reference's ingest shape
  * (reproduce tails log files and parses lines —
  * /root/reference/src/collector/zeek.rs:141-161): each row carries one log
  * line in one of four formats keyed by `source`, mirroring the reference's
  * format families (Zeek TSV positional, nginx access-log grok, Fortinet
  * key=value, operation-log level lines — SURVEY.md §2.2).
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")

  // --- portable integer helpers (exact DuckDB twins in Oracles.scala) ---

  /** Truncating integer division for non-negative operands: floor(a/b). */
  def idiv(a: Column, b: Long): Column = floor(a / lit(b)).cast("long")

  /** Word → deterministic int32 token id. Pure arithmetic over the first
    * char, last char and length so DuckDB computes the identical id.
    */
  def wordToken(w: Column): Column =
    (((ascii(w) * lit(59) + ascii(w.substr(length(w), lit(1)))) * lit(31) +
      length(w)) % lit(32768)).cast("int")

  /** documents → words array (split on single space, drop empties). */
  def wordsCol(text: Column): Column =
    filter(split(text, " "), w => length(w) > lit(0))

  /** The north-rule tokens table:
    * (doc_id string, tokens array<int>, n_tok int, source string)
    * plus lineage columns (line_no, lang, n_chars) used by the
    * order-dependent dedup operators (SURVEY.md §2.3).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    val toks = transform(wordsCol(col("text")), wordToken _)
    d.select(
      concat(lit("doc-"), lpad(col("doc_id").cast("string"), 12, "0")).as("doc_id"),
      toks.as("tokens"),
      size(toks).as("n_tok"),
      col("source"),
      col("doc_id").as("line_no"),
      col("lang"),
      col("n_chars")
    )
  }

  // --- synthetic raw log lines (the parse-stage input) ---

  /** source "srcK" → K (int). */
  def sourceNum(source: Column): Column =
    source.substr(lit(4), lit(8)).cast("int")

  /** Format family for a source: 0=oplog 1=nginx 2=fgt 3=zeek. */
  def kindNum(source: Column): Column = sourceNum(source) % lit(4)

  def kindName(source: Column): Column =
    element_at(array(lit("oplog"), lit("nginx"), lit("fgt"), lit("zeek")), kindNum(source) + lit(1))

  /** One deterministic log line per document, format keyed by source.
    * Input columns required: doc_id (long), source, n_chars.
    */
  def rawLine(did: Column, source: Column, nChars: Column): Column = {
    // deliberately low-cardinality ts so the dedup window has real
    // collisions to resolve (reference: apply_timestamp_dedup uniquifies
    // equal-ts runs — src/collector/common.rs:8-24)
    val sec = lit(1700000000L) + (did % lit(1000L))
    val frac = lpad(((did % lit(7L)) * lit(125000L)).cast("string"), 6, "0")
    val level = element_at(array(lit("INFO"), lit("WARN"), lit("ERROR")), (did % lit(3)).cast("int") + lit(1))
    val ip = concat(lit("10."), (did % lit(250L)).cast("string"), lit("."),
      (idiv(did, 250L) % lit(250L)).cast("string"), lit("."), ((did % lit(200L)) + lit(1)).cast("string"))
    val port = (lit(1024L) + (did % lit(60000L))).cast("string")
    val status = element_at(array(lit("200"), lit("404"), lit("500"), lit("302")), (did % lit(4)).cast("int") + lit(1))
    val dur = when(did % lit(5) === lit(0), lit("-"))
      .otherwise(concat((did % lit(100L)).cast("string"), lit(".5")))
    val tab = lit("\t")
    val k = kindNum(source)
    // every 97th doc carries a malformed line: parse must drop-and-count,
    // never fail (reference semantics — src/collector/zeek.rs:118-139)
    when(did % lit(97) === lit(0), concat(lit("CORRUPT "), did.cast("string")))
      .when(k === 0, concat(sec.cast("string"), lit("."), frac, lit(" "), level,
        lit(" job-"), did.cast("string"), lit(" took "), nChars.cast("string"), lit("ms")))
      .when(k === 1, concat(ip, lit(" - - ["), sec.cast("string"), lit("] \"GET /p/"),
        did.cast("string"), lit(" HTTP/1.1\" "), status, lit(" "), nChars.cast("string")))
      .when(k === 2, concat(lit("date="), sec.cast("string"), lit(" srcip="), ip,
        lit(" dstip=10.0.0.1 proto=6 srcport="), port, lit(" dstport=443 action="), level))
      .otherwise(concat(sec.cast("string"), lit("."), frac, tab, lit("uid"), did.cast("string"),
        tab, ip, tab, port, tab, lit("10.0.0.2"), tab, lit("443"), tab, lit("tcp"), tab, dur))
  }

  /** tokens table + raw_line + kind: the full pipeline input. */
  def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    val toks = transform(wordsCol(col("text")), wordToken _)
    d.select(
      concat(lit("doc-"), lpad(col("doc_id").cast("string"), 12, "0")).as("doc_id"),
      toks.as("tokens"),
      size(toks).as("n_tok"),
      col("source"),
      col("doc_id").as("line_no"),
      rawLine(col("doc_id"), col("source"), col("n_chars")).as("raw_line"),
      kindName(col("source")).as("kind")
    )
  }

  /** Broadcast-side source dimension (analog of SecurityLogInfo —
    * /root/reference/src/parser/security_log.rs:54-87): one row per source,
    * derived deterministically so the oracle can rebuild it.
    */
  def sourceDim(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select("source").distinct()
    d.select(
      col("source"),
      concat(lit("vendor-"), (sourceNum(col("source")) % lit(7)).cast("string")).as("vendor"),
      kindName(col("source")).as("log_type"),
      concat(lit("v"), (sourceNum(col("source")) % lit(3) + lit(1)).cast("string")).as("version")
    )
  }
}
