package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Positional

/** Elasticsearch fetch — the live source behind the reference's sysmon dump
  * (`fetch_elastic_search`, /root/reference/src/parser/sysmon_csv.rs:77-305).
  * Per (index, event_code) it POSTs the reference's exact `_search` body and
  * pages by `search_after` on the `@timestamp` sort value: continue while a
  * page comes back FULL (data.len == size), carry the last hit's `sort[0]`
  * forward, stop on a short or empty page (fetch_data_from_es,
  * sysmon_csv.rs:168-205). Auth is the reference's Basic header
  * (build_elastic_client, sysmon_csv.rs:207-226).
  *
  * Spark-first split: the page loop within one (index, event_code) is
  * inherently sequential (each request's search_after comes from the
  * previous response), but DIFFERENT (index, code) pairs are independent —
  * [[fetchDistributed]] parallelizes them across the cluster as a Dataset of
  * fetch tasks, which is how a day-partitioned index family actually scales;
  * [[fetchAll]] is the reference's single-process shape for bounded dumps.
  *
  * Message → columns stays declarative: sysmon's "Key: value" message lines
  * become a per-row map (`str_to_map` + trim, [[msgMap]] — the twin of
  * `split_message_part`'s split-on-first-colon-and-trim, sysmon_csv.rs:357),
  * and [[rawColumns]] projects them into the staged-CSV column order of the
  * RE-INGEST layouts ([[Positional.sysmonCsv]]), so [[typed]] reuses the
  * oracle-verified decode unchanged.
  *
  * Documented reference bug (not reproduced): its ES dump structs write
  * `parent_process_id` BEFORE `parent_process_guid`
  * (sysmon_csv/process_create.rs:207-208) while its own CSV reader expects
  * guid at column 20 and id at 21 (process_create.rs:121-135) — an ES-dumped
  * process_create file re-ingests with the two swapped. This connector emits
  * the READER's order, i.e. the dump that round-trips.
  */
object Elastic {

  final case class EsConfig(url: String, auth: String,
                            indices: Seq[String], eventCodes: Seq[String],
                            startTime: String, endTime: String, size: Int)

  /** One ES hit, reduced to what the dump consumes: the sort timestamp, the
    * two `_source.agent` fields, and the sysmon message text.
    */
  final case class EsHit(index: String, event_code: String, sort_ts: Long,
                         agent_name: String, agent_id: String, message: String)

  /** The reference's exact query body (build_query, sysmon_csv.rs:228-246):
    * bool musts on event.code / event.module=sysmon / @timestamp range,
    * size, ascending @timestamp sort, search_after [last].
    */
  def queryJson(eventCode: String, cfg: EsConfig, lastTs: Long): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val must = root.putObject("query").putObject("bool").putArray("must")
    must.addObject().putObject("term").put("event.code", eventCode)
    must.addObject().putObject("term").put("event.module", "sysmon")
    val range = must.addObject().putObject("range").putObject("@timestamp")
    range.put("gt", cfg.startTime)
    range.put("lt", cfg.endTime)
    root.put("size", cfg.size)
    root.putArray("sort").addObject().put("@timestamp", "asc")
    root.putArray("search_after").add(lastTs)
    m.writeValueAsString(root)
  }

  private def basicAuth(auth: String): String =
    "Basic " + Base64.getEncoder.encodeToString(auth.getBytes(StandardCharsets.UTF_8))

  /** One (index, event_code)'s sequential page loop. A missing/empty
    * `hits.hits` ends the loop (the reference would spin forever on a
    * malformed response with no hits array — terminating is the one safe
    * divergence).
    */
  def fetchPages(cfg: EsConfig, index: String, eventCode: String): Seq[EsHit] = {
    val client = HttpClient.newHttpClient()
    val mapper = new ObjectMapper()
    val out = Seq.newBuilder[EsHit]
    var lastTs = 0L
    var done = false
    while (!done) {
      val req = HttpRequest.newBuilder(URI.create(s"${cfg.url}/$index/_search"))
        .header("Authorization", basicAuth(cfg.auth))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(queryJson(eventCode, cfg, lastTs)))
        .build()
      val body = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
      val hits = mapper.readTree(body).path("hits").path("hits")
      val n = if (hits.isArray) hits.size() else 0
      var k = 0
      while (k < n) {
        val h = hits.get(k)
        val src = h.path("_source")
        out += EsHit(index, eventCode, h.path("sort").path(0).asLong(),
          src.path("agent").path("name").asText(""),
          src.path("agent").path("id").asText(""),
          src.path("message").asText(""))
        k += 1
      }
      if (n == cfg.size) lastTs = hits.get(n - 1).path("sort").path(0).asLong()
      else done = true // short or empty page: the index is drained
    }
    out.result()
  }

  /** Driver-side eager dump over every (index, event_code) — the reference's
    * single-process shape.
    */
  def fetchAll(cfg: EsConfig): Seq[EsHit] =
    for (code <- cfg.eventCodes; index <- cfg.indices; hit <- fetchPages(cfg, index, code))
      yield hit

  /** Cluster-parallel fetch: one task per (index, event_code) pair —
    * paging within a pair is sequential by protocol, pairs are not.
    */
  def fetchDistributed(spark: SparkSession, cfg: EsConfig): Dataset[EsHit] = {
    import spark.implicits._
    val tasks = for (i <- cfg.indices; c <- cfg.eventCodes) yield (i, c)
    spark.createDataset(tasks)
      .repartition(math.max(1, math.min(tasks.length, spark.sparkContext.defaultParallelism)))
      .mapPartitions(_.flatMap { case (i, c) => fetchPages(cfg, i, c) })
  }

  /** event code → (re-ingest layout name, the dump's constant event_action)
    * — the 14-arm match of fetch_elastic_search (sysmon_csv.rs:96-160) with
    * each struct's event_action literal.
    */
  val eventTypes: Map[Int, (String, String)] = Map(
    1 -> ("w_process_create", "Process Create"),
    2 -> ("w_file_create_time", "File creation time changed"),
    3 -> ("w_network_connect", "Network connection detected"),
    5 -> ("w_process_terminate", "Process terminated"),
    7 -> ("w_image_load", "Image loaded"),
    11 -> ("w_file_create", "File created"),
    13 -> ("w_registry_value_set", "Registry value set"),
    14 -> ("w_registry_key_rename", "Registry key rename"),
    15 -> ("w_file_create_stream_hash", "File stream created"),
    17 -> ("w_pipe_event", "Pipe Created"),
    22 -> ("w_dns_query", "Dns query"),
    23 -> ("w_file_delete", "File Delete archived,"),
    25 -> ("w_process_tamper", "Process Tampering,"),
    26 -> ("w_file_delete_detected", "File Delete logged,"))

  /** Layout field name → sysmon message key (the `match key` arms of the 14
    * EventToCsv impls). Snake→Camel covers all but the renamed fields.
    */
  def messageKey(field: String): String = field match {
    case "user_s" => "User"            // `user` is reserved in the layouts
    case "tamper_type" => "Type"       // process_tamper.rs key
    case "ts_ns" => "UtcTime"
    case other => other.split("_").map(w => w.head.toUpper + w.tail).mkString
  }

  /** "Key: value" message lines → map, split on the FIRST colon with both
    * sides trimmed — split_message_part's semantics (sysmon_csv.rs:357-360).
    * HOFs are fine here: a sysmon message is a bounded ~25-line block.
    */
  def msgMap(message: Column): Column =
    transform_values(
      transform_keys(str_to_map(message, lit("\n"), lit(":")), (k, _) => trim(k)),
      (_, v) => trim(v))

  private def protoOf(code: Int) = {
    val name = eventTypes(code)._1
    Positional.sysmonCsv.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no layout $name"))
  }

  /** Hits → staged-CSV cells c0..cN in the RE-INGEST layout's column order:
    * agent fields from `_source.agent`, the constant event_action, then the
    * message keys. Writing these tab-joined yields the event{code}_log.csv
    * the staging ingest ([[Staging.readStagingDir]]) routes and decodes.
    */
  def rawColumns(hits: DataFrame, code: Int): DataFrame = {
    val (_, action) = eventTypes(code)
    val proto = protoOf(code)
    val m = msgMap(col("message"))
    val cells = proto.fields.zipWithIndex.map { case (f, i) =>
      val c = f.name match {
        case "agent_name" => col("agent_name")
        case "agent_id" => col("agent_id")
        case "skip2" => lit(action)
        // a missing message key is an EMPTY cell in the reference's dump
        // (serde serializes None as ""), not a NULL
        case other => coalesce(element_at(m, messageKey(other)), lit(""))
      }
      c.as(s"c$i")
    }
    hits.select(cells: _*)
  }

  /** Hits → the typed frame, through the oracle-verified layout decode. */
  def typed(hits: DataFrame, code: Int): DataFrame =
    rawColumns(hits, code)
      .select(Positional.fromColumns(protoOf(code), i => s"c$i").as("o"))
}
