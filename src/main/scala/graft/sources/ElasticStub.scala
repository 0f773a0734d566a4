package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process Elasticsearch `_search` stub — the zero-egress test harness
  * for [[Elastic]], in the same spirit as the staged pcap/TSV fixtures
  * ([[Pcap.stage]], RawLog.stage): the CLIENT code under test is the real
  * HTTP/paging implementation; only the far end is canned. The stub speaks
  * the slice of the protocol the reference exercises (sysmon_csv.rs:248-263):
  * POST /{index}/_search with the bool-query body → `hits.hits` sorted by
  * `@timestamp` ascending, honoring `size` and `search_after[0]` (strictly
  * greater), each hit carrying `sort[0]`, `_source.agent.{name,id}` and
  * `_source.message`.
  */
object ElasticStub {

  /** One canned hit: ascending unique sort timestamp + the `_source`
    * fields the dump consumes.
    */
  final case class StubHit(sortTs: Long, agentName: String, agentId: String,
                           message: String)

  /** One observed request, recorded for assertions. */
  final case class SeenRequest(index: String, auth: String, eventCode: String,
                               searchAfter: Long, size: Int)

  final class Handle(server: HttpServer, val seen: ConcurrentLinkedQueue[SeenRequest]) {
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def requests: Seq[SeenRequest] = seen.asScala.toSeq
    def stop(): Unit = server.stop(0)
  }

  /** Start on an ephemeral localhost port. `data` is keyed by
    * (index, eventCode) with hits pre-sorted by sortTs ascending.
    */
  def start(data: Map[(String, String), IndexedSeq[StubHit]]): Handle = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new ConcurrentLinkedQueue[SeenRequest]()
    val mapper = new ObjectMapper()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath // /{index}/_search
        val index = path.stripPrefix("/").stripSuffix("/_search")
        val body = mapper.readTree(ex.getRequestBody.readAllBytes())
        val code = body.path("query").path("bool").path("must")
          .path(0).path("term").path("event.code").asText("")
        val after = body.path("search_after").path(0).asLong()
        val size = body.path("size").asInt(10)
        seen.add(SeenRequest(index,
          Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
          code, after, size))
        val page = data.getOrElse((index, code), IndexedSeq.empty)
          .dropWhile(_.sortTs <= after).take(size)
        val root = mapper.createObjectNode()
        val hits = root.putObject("hits").putArray("hits")
        page.foreach { h =>
          val hit = hits.addObject()
          hit.putArray("sort").add(h.sortTs)
          val src = hit.putObject("_source")
          src.put("message", h.message)
          val agent = src.putObject("agent")
          agent.put("name", h.agentName)
          agent.put("id", h.agentId)
        }
        val out = mapper.writeValueAsBytes(root)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, out.length.toLong)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.setExecutor(null)
    server.start()
    new Handle(server, seen)
  }
}
