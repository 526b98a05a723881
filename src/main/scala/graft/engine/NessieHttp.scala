package graft.engine

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Nessie's catalog verbs over HTTP — the reference runs Nessie as a
  * service (compose.yaml:93-107) and Trino speaks its REST API; graft
  * has the verbs as library calls ([[Layout.listRefs]]/[[Layout.commitLog]],
  * q162-gated) and this facade puts them on a real socket in the Nessie
  * v2 REST shapes:
  *
  *   - `GET /api/v2/trees` → `{"references": [{"name", "type"
  *     ("BRANCH"/"TAG"), "hash"}]}`  — reference listing
  *   - `GET /api/v2/trees/{ref}/history` → `{"logEntries":
  *     [{"commitMeta": {...}, "parentCommitHash"}]}` — commit log,
  *     newest first, truncated at the ref's snapshot
  *
  * Zero new dependencies: the JDK's `com.sun.net.httpserver` (the same
  * choice Spark's own test fixtures make for tiny HTTP endpoints).
  * Commit "hashes" are the graft snapshot seqs rendered as 16-hex — the
  * shape Nessie clients expect — with the seq recoverable by parse.
  *
  * One server serves ONE table's refs (graft refs are per-table where
  * Nessie's are per-repository); a catalog-wide facade would mount one
  * context per table. Driver-side by design: refs and commit logs are
  * bounded metadata, the same rows q162 reads.
  */
object NessieHttp {

  private val mapper = new ObjectMapper()

  final case class Server(http: HttpServer, port: Int) {
    def stop(): Unit = http.stop(0)
    def uri(path: String): String = s"http://127.0.0.1:$port$path"
  }

  def hashOf(seq: Long): String = f"$seq%016x"

  /** Start serving `table`'s refs on `port` (0 = ephemeral). */
  def start(spark: SparkSession, table: String, port: Int = 0): Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    http.createContext("/api/v2/trees", (exchange: HttpExchange) => {
      try route(spark, table, exchange)
      catch {
        case scala.util.control.NonFatal(e) =>
          send(exchange, 500, s"""{"message":"${e.getClass.getSimpleName}"}""")
      }
    })
    http.start()
    Server(http, http.getAddress.getPort)
  }

  private def route(spark: SparkSession, table: String,
      exchange: HttpExchange): Unit = {
    val path = exchange.getRequestURI.getPath
    if (exchange.getRequestMethod != "GET") send(exchange, 405, """{"message":"GET only"}""")
    else path match {
      case "/api/v2/trees" | "/api/v2/trees/" =>
        send(exchange, 200, referencesJson(spark, table))
      case HistoryPath(ref) =>
        historyJson(spark, table, ref) match {
          case Some(body) => send(exchange, 200, body)
          case None => send(exchange, 404,
            s"""{"message":"reference not found: $ref"}""")
        }
      case _ => send(exchange, 404, """{"message":"no route"}""")
    }
  }

  private object HistoryPath {
    private val re = "/api/v2/trees/([^/]+)/history".r
    def unapply(path: String): Option[String] = path match {
      case re(ref) => Some(java.net.URLDecoder.decode(ref, "UTF-8"))
      case _ => None
    }
  }

  private def send(exchange: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(code, bytes.length.toLong)
    val os = exchange.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** The `GET /trees` body, straight from [[Layout.listRefs]]. */
  def referencesJson(spark: SparkSession, table: String): String = {
    val rows = Layout.listRefs(spark, table).collect()
    val root = mapper.createObjectNode()
    val refs = mapper.createArrayNode()
    rows.foreach { r =>
      val n = mapper.createObjectNode()
      n.put("name", r.getString(0))
      n.put("type", r.getString(1).toUpperCase)
      n.put("hash", hashOf(r.getLong(2)))
      refs.add(n)
    }
    root.set[ObjectNode]("references", refs)
    mapper.writeValueAsString(root)
  }

  /** The `GET /trees/{ref}/history` body: [[Layout.commitLog]] truncated
    * to the chain reachable from `ref`'s snapshot, newest first. None if
    * the ref doesn't exist. */
  def historyJson(spark: SparkSession, table: String, ref: String): Option[String] = {
    val refRows = Layout.listRefs(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    refRows.get(ref).map { tip =>
      val log = Layout.commitLog(spark, table).collect()
      // walk the parent chain from the tip — a ref's history is its
      // reachable commits, not every commit in the table
      val bySeq = log.map(r => r.getLong(0) -> r).toMap
      val chain = Iterator.iterate(tip)(s => bySeq.get(s)
        .map(_.getLong(1)).getOrElse(-1L))
        .takeWhile(_ >= 0).flatMap(bySeq.get).toSeq
      val root = mapper.createObjectNode()
      val entries = mapper.createArrayNode()
      chain.foreach { r =>
        val entry = mapper.createObjectNode()
        val meta = mapper.createObjectNode()
        meta.put("hash", hashOf(r.getLong(0)))
        meta.put("message", r.getString(2))
        meta.put("numFiles", r.getLong(3))
        meta.put("numRecords", r.getLong(4))
        meta.put("totalBytes", r.getLong(5))
        entry.set[ObjectNode]("commitMeta", meta)
        if (r.getLong(1) >= 0)
          entry.put("parentCommitHash", hashOf(r.getLong(1)))
        entries.add(entry)
      }
      root.set[ObjectNode]("logEntries", entries)
      mapper.writeValueAsString(root)
    }
  }
}
