package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.{SparkSpec, Tables}

/** Drives the Nessie-shaped HTTP facade over a REAL socket (JDK
  * HttpClient against an ephemeral port) and diffs every response field
  * against the q162 library surface ([[Layout.listRefs]]/
  * [[Layout.commitLog]]) — the facade must be a pure re-encoding, never
  * a second source of truth. */
class NessieHttpSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String): (Int, JsonNode) = {
    val resp = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def post(url: String, body: String = "{}"): (Int, JsonNode) = {
    val resp = client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def delete(url: String): (Int, JsonNode) = {
    val resp = client.send(HttpRequest.newBuilder(URI.create(url)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def freshRefTable(): String = {
    val t = s"nessie_${java.util.UUID.randomUUID().toString.take(8)}"
    val events = Tables.events(spark, sf0001).select("event_id", "event_type", "value")
    events.filter(col("event_id") % 2 === 0).write.saveAsTable(t)
    Layout.snapshot(spark, t, "v1") // commit 0, tag v1
    Layout.deleteWhereMor(spark, t, col("event_id") < 100L) // commit 1
    t
  }

  test("GET /trees lists main + tags exactly as Layout.listRefs") {
    val t = freshRefTable()
    val server = NessieHttp.start(spark, t)
    try {
      val (code, body) = get(server.uri("/api/v2/trees"))
      assert(code === 200)
      val got = (0 until body.get("references").size())
        .map(body.get("references").get(_))
        .map(n => (n.get("name").asText(), n.get("type").asText(),
          java.lang.Long.parseLong(n.get("hash").asText(), 16)))
      val want = Layout.listRefs(spark, t).collect()
        .map(r => (r.getString(0), r.getString(1).toUpperCase, r.getLong(2))).toSeq
      assert(got === want)
      assert(got.exists(r => r._1 == "main" && r._2 == "BRANCH" && r._3 == 1L))
      assert(got.exists(r => r._1 == "v1" && r._2 == "TAG" && r._3 == 0L))
    } finally server.stop()
  }

  test("GET /trees/{ref}/history matches Layout.commitLog and truncates at the ref") {
    val t = freshRefTable()
    val server = NessieHttp.start(spark, t)
    try {
      // main: both commits, newest first, parent chain linked by hash
      val (code, body) = get(server.uri("/api/v2/trees/main/history"))
      assert(code === 200)
      val entries = (0 until body.get("logEntries").size())
        .map(body.get("logEntries").get(_))
      val wantLog = Layout.commitLog(spark, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(entries.size === wantLog.length)
      entries.zip(wantLog).foreach { case (e, (seq, parent, op, nf, nr, tb)) =>
        val meta = e.get("commitMeta")
        assert(java.lang.Long.parseLong(meta.get("hash").asText(), 16) === seq)
        assert(meta.get("message").asText() === op)
        assert(meta.get("numFiles").asLong() === nf)
        assert(meta.get("numRecords").asLong() === nr)
        assert(meta.get("totalBytes").asLong() === tb)
        if (parent >= 0)
          assert(java.lang.Long.parseLong(
            e.get("parentCommitHash").asText(), 16) === parent)
        else assert(e.get("parentCommitHash") == null)
      }
      // tag v1 points at commit 0: history from the tag has ONE entry
      val (c2, b2) = get(server.uri("/api/v2/trees/v1/history"))
      assert(c2 === 200)
      assert(b2.get("logEntries").size() === 1)
      assert(java.lang.Long.parseLong(
        b2.get("logEntries").get(0).get("commitMeta").get("hash").asText(), 16) === 0L)
      // unknown refs 404 (JSON); unknown routes 404 (server default — may
      // not be JSON, so check status only)
      assert(get(server.uri("/api/v2/trees/nope/history"))._1 === 404)
      val raw = client.send(
        HttpRequest.newBuilder(URI.create(server.uri("/api/v2/nope"))).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(raw.statusCode() === 404)
    } finally server.stop()
  }

  test("write verbs drive a full fork→commit→merge→conflict cycle over the socket") {
    import spark.implicits._
    val t = s"nessie_w_${java.util.UUID.randomUUID().toString.take(8)}"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable(t)
    val server = NessieHttp.start(spark, t)
    try {
      // fork a branch over the wire; duplicate → the 409 Nessie returns
      val (c1, b1) = post(server.uri("/api/v2/trees?name=etl&type=BRANCH"))
      if (c1 != 200) fail(s"create branch: $c1 $b1")
      assert(b1.at("/reference/name").asText() === "etl")
      assert(post(server.uri("/api/v2/trees?name=etl&type=BRANCH"))._1 === 409)
      assert(spark.catalog.tableExists(s"${t}__branch_etl"))

      // data plane writes the rows (as with real Nessie: the API moves
      // pointers, Spark moves bytes); the wire commit records metadata
      Seq((3L, "c")).toDF("id", "v").write.mode("append")
        .saveAsTable(s"${t}__branch_etl")
      val head = Manifests.loadRefs(Manifests.root(spark, s"${t}__branch_etl")).head
      val commitBody =
        s"""{"commitMeta":{"message":"wire-append"},
           |"expectedHash":"${NessieHttp.hashOf(head)}",
           |"operations":[{"op":"PUT","path":"f1.parquet","records":1,"bytes":10}]}""".stripMargin
      val (c2, b2) = post(server.uri("/api/v2/trees/etl/history/commit"), commitBody)
      assert(c2 === 200)
      val newHash = b2.at("/targetBranch/hash").asText()
      assert(NessieHttp.seqOf(newHash) === head + 1)
      // a commit based on the now-stale hash → 409 before touching refs
      assert(post(server.uri("/api/v2/trees/etl/history/commit"), commitBody)._1 === 409)
      // the wire commit is in the branch's history over the wire
      val (_, hist) = get(server.uri("/api/v2/trees/main/history"))
      assert(hist.get("logEntries") != null) // main's own history unaffected

      // fast-forward merge publishes the branch into main
      val (c3, _) = post(server.uri("/api/v2/trees/main/history/merge"),
        """{"fromRefName":"etl"}""")
      assert(c3 === 200)
      assert(spark.table(t).as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(!spark.catalog.tableExists(s"${t}__branch_etl"))

      // conflict: main moves after the fork → merge refuses with 409
      assert(post(server.uri("/api/v2/trees?name=etl2&type=BRANCH"))._1 === 200)
      Seq((9L, "z")).toDF("id", "v").write.mode("append").saveAsTable(t)
      val (c4, b4) = post(server.uri("/api/v2/trees/main/history/merge"),
        """{"fromRefName":"etl2"}""")
      assert(c4 === 409 && b4.get("message").asText().contains("conflict"))
      assert(spark.catalog.tableExists(s"${t}__branch_etl2")) // survives for rebase
      // merging an unknown branch → 404; then abandon etl2 over the wire
      assert(post(server.uri("/api/v2/trees/main/history/merge"),
        """{"fromRefName":"nope"}""")._1 === 404)
      assert(delete(server.uri("/api/v2/trees/etl2"))._1 === 200)
      assert(!spark.catalog.tableExists(s"${t}__branch_etl2"))
      assert(delete(server.uri("/api/v2/trees/main"))._1 === 400)
    } finally server.stop()
  }

  test("GET /trees/{ref}/contents/{key}: the table pointer at main, a tag, a branch; 404s") {
    val t = freshRefTable() // commit 0 tagged v1, commit 1 on main
    val server = NessieHttp.start(spark, t)
    try {
      // main: content resolves to the CURRENT manifest file + head seq
      val (c1, b1) = get(server.uri(s"/api/v2/trees/main/contents/$t"))
      assert(c1 === 200)
      assert(b1.at("/content/type").asText() === "ICEBERG_TABLE")
      assert(b1.at("/content/snapshotId").asLong() === 1L)
      assert(b1.at("/effectiveReference/name").asText() === "main")
      assert(b1.at("/effectiveReference/hash").asText() === NessieHttp.hashOf(1L))
      val loc = b1.at("/content/metadataLocation").asText()
      val refs = Manifests.loadRefs(Manifests.root(spark, t))
      assert(loc.endsWith(refs.snapName(1L)),
        s"metadataLocation must be the manifest the read path loads: $loc")
      // the tag points one commit back — a DIFFERENT manifest file
      val (c2, b2) = get(server.uri(s"/api/v2/trees/v1/contents/$t"))
      assert(c2 === 200)
      assert(b2.at("/content/snapshotId").asLong() === 0L)
      assert(b2.at("/effectiveReference/type").asText() === "TAG")
      assert(b2.at("/content/metadataLocation").asText() !== loc)
      // a branch resolves against ITS OWN head (fork + branch-side commit)
      assert(post(server.uri("/api/v2/trees?name=etl&type=BRANCH"))._1 === 200)
      Layout.deleteWhereMor(spark, s"${t}__branch_etl", col("event_id") < 200L)
      val (c3, b3) = get(server.uri(s"/api/v2/trees/etl/contents/$t"))
      assert(c3 === 200)
      val branchHead = Manifests.loadRefs(
        Manifests.root(spark, s"${t}__branch_etl")).head
      assert(b3.at("/content/snapshotId").asLong() === branchHead)
      // 404s: unknown ref, wrong key
      assert(get(server.uri(s"/api/v2/trees/nope/contents/$t"))._1 === 404)
      assert(get(server.uri("/api/v2/trees/main/contents/other_table"))._1 === 404)
    } finally server.stop()
  }

  test("GET /trees/{from}/diff/{to}: cross-ref manifest diff, empty self-diff, 404") {
    val t = freshRefTable() // v1 = commit 0 (full table), main = commit 1 (MOR delete)
    val server = NessieHttp.start(spark, t)
    try {
      // self-diff: same snapshot → empty diffs (the Nessie contract)
      val (c0, b0) = get(server.uri("/api/v2/trees/main/diff/main"))
      assert(c0 === 200 && b0.get("diffs").size() === 0)
      // v1 → main: one entry for the served key with both content
      // objects and the manifest file-diff the snapshots prove
      val (c1, b1) = get(server.uri("/api/v2/trees/v1/diff/main"))
      assert(c1 === 200 && b1.get("diffs").size() === 1)
      val e = b1.get("diffs").get(0)
      assert(e.at("/key/elements/0").asText() === t)
      assert(e.at("/from/snapshotId").asLong() === 0L)
      assert(e.at("/to/snapshotId").asLong() === 1L)
      // the independent truth: set-diff the two snapshots' file lists
      val root = Manifests.root(spark, t)
      val f0 = Manifests.loadSnapshot(root, 0L).files.map(_.path).toSet
      val f1 = Manifests.loadSnapshot(root, 1L).files.map(_.path).toSet
      assert(e.get("filesAdded").asInt() === (f1 -- f0).size)
      assert(e.get("filesRemoved").asInt() === (f0 -- f1).size)
      val r0 = Manifests.loadSnapshot(root, 0L).files.map(_.records).sum
      val r1 = Manifests.loadSnapshot(root, 1L).files.map(_.records).sum
      assert(e.get("recordsDelta").asLong() === r1 - r0)
      // direction flips the roles
      val (_, b2) = get(server.uri("/api/v2/trees/main/diff/v1"))
      val e2 = b2.get("diffs").get(0)
      assert(e2.at("/from/snapshotId").asLong() === 1L)
      assert(e2.at("/to/snapshotId").asLong() === 0L)
      assert(e2.get("filesAdded").asInt() === (f0 -- f1).size)
      // 404 names the missing ref
      val (c3, b3) = get(server.uri("/api/v2/trees/ghost/diff/main"))
      assert(c3 === 404 && b3.get("message").asText().contains("ghost"))
    } finally server.stop()
  }

  private def put(url: String, body: String): (Int, JsonNode) = {
    val resp = client.send(HttpRequest.newBuilder(URI.create(url))
      .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  test("GET /trees/{ref}/entries: key listing at main/tag/branch; empty branch; 404") {
    val t = freshRefTable()
    val server = NessieHttp.start(spark, t)
    try {
      val (c1, b1) = get(server.uri("/api/v2/trees/main/entries"))
      assert(c1 === 200 && b1.get("entries").size() === 1)
      assert(b1.at("/entries/0/name/elements/0").asText() === t)
      assert(b1.at("/entries/0/type").asText() === "ICEBERG_TABLE")
      assert(b1.at("/effectiveReference/hash").asText() === NessieHttp.hashOf(1L))
      // a tag serves the same key at its own hash
      val (c2, b2) = get(server.uri("/api/v2/trees/v1/entries"))
      assert(c2 === 200 && b2.get("entries").size() === 1)
      assert(b2.at("/effectiveReference/hash").asText() === NessieHttp.hashOf(0L))
      // a FRESH fork has no committed head yet → the ref exists and
      // lists EMPTY (real Nessie's empty-branch behavior)…
      assert(post(server.uri("/api/v2/trees?name=etl2&type=BRANCH"))._1 === 200)
      val (c3e, b3e) = get(server.uri("/api/v2/trees/etl2/entries"))
      assert(c3e === 200 && b3e.get("entries").size() === 0)
      // …and serves the key after its first branch-side commit
      Layout.deleteWhereMor(spark, s"${t}__branch_etl2", col("event_id") < 200L)
      val (c3, b3) = get(server.uri("/api/v2/trees/etl2/entries"))
      assert(c3 === 200 && b3.at("/entries/0/name/elements/0").asText() === t)
      // unknown ref → 404
      assert(get(server.uri("/api/v2/trees/ghost/entries"))._1 === 404)
    } finally server.stop()
  }

  test("PUT /trees/{ref}: assign rolls the head pointer back; guards and errors") {
    val t = freshRefTable() // commit 0 tagged v1, commit 1 on main
    val server = NessieHttp.start(spark, t)
    try {
      // roll main back to commit 0 — one pointer swap, no data movement
      val (c1, b1) = put(server.uri("/api/v2/trees/main"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(0L)}"}""")
      assert(c1 === 200 &&
        b1.at("/reference/hash").asText() === NessieHttp.hashOf(0L))
      // the whole catalog surface now serves the rolled-back head:
      // contents points at commit 0's manifest file...
      val (c2, b2) = get(server.uri(s"/api/v2/trees/main/contents/$t"))
      assert(c2 === 200 && b2.at("/content/snapshotId").asLong() === 0L)
      val refs = Manifests.loadRefs(Manifests.root(spark, t))
      assert(b2.at("/content/metadataLocation").asText()
        .endsWith(refs.snapName(0L)))
      // ...and main↔v1 diff is now EMPTY (same snapshot)
      val (c3, b3) = get(server.uri("/api/v2/trees/v1/diff/main"))
      assert(c3 === 200 && b3.get("diffs").size() === 0)
      // rolled-back commit 1 stays in the log (history is append-only)
      assert(Manifests.listSnapshots(Manifests.root(spark, t))
        .map(_.seq).contains(1L))
      // a NEW commit continues from nextSeq — never reuses seq 1
      Layout.deleteWhereMor(spark, t, col("event_id") < 150L)
      assert(Manifests.loadRefs(Manifests.root(spark, t)).head === 2L)
      // optimistic guard: stale expectedHash → 409, head untouched
      val (c4, b4) = put(server.uri(
        s"/api/v2/trees/main@${NessieHttp.hashOf(0L)}"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(1L)}"}""")
      assert(c4 === 409 && b4.get("message").asText().contains("conflict"))
      assert(Manifests.loadRefs(Manifests.root(spark, t)).head === 2L)
      // matching expectedHash succeeds
      assert(put(server.uri(s"/api/v2/trees/main@${NessieHttp.hashOf(2L)}"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(1L)}"}""")._1 === 200)
      assert(Manifests.loadRefs(Manifests.root(spark, t)).head === 1L)
      // 400: a hash naming no committed snapshot; a MALFORMED guard
      // hash (client error, not a 500); 404: unknown ref
      assert(put(server.uri("/api/v2/trees/main"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(77L)}"}""")._1 === 400)
      assert(put(server.uri("/api/v2/trees/main@not-hex"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(0L)}"}""")._1 === 400)
      assert(put(server.uri("/api/v2/trees/ghost"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(0L)}"}""")._1 === 404)
    } finally server.stop()
  }

  test("PUT /trees/{tag}: AssignReference covers tags; guards; fork tags stay internal") {
    val t = freshRefTable() // commit 0 tagged v1, commit 1 on main
    val server = NessieHttp.start(spark, t)
    try {
      // reassign tag v1 from commit 0 to commit 1 — type TAG in the echo
      val (c1, b1) = put(server.uri("/api/v2/trees/v1"),
        s"""{"type":"TAG","hash":"${NessieHttp.hashOf(1L)}"}""")
      assert(c1 === 200 && b1.at("/reference/type").asText() === "TAG" &&
        b1.at("/reference/hash").asText() === NessieHttp.hashOf(1L))
      assert(Manifests.loadRefs(Manifests.root(spark, t)).tags("v1") === 1L)
      // the catalog surface follows: v1's contents now serve commit 1
      val (c2, b2) = get(server.uri(s"/api/v2/trees/v1/contents/$t"))
      assert(c2 === 200 && b2.at("/content/snapshotId").asLong() === 1L)
      // optimistic guard on the TAG pointer: stale (v1 is at 1, not 0) → 409
      val (c3, b3) = put(server.uri(s"/api/v2/trees/v1@${NessieHttp.hashOf(0L)}"),
        s"""{"type":"TAG","hash":"${NessieHttp.hashOf(0L)}"}""")
      assert(c3 === 409 && b3.get("message").asText().contains("conflict"))
      // matching guard rolls it back
      assert(put(server.uri(s"/api/v2/trees/v1@${NessieHttp.hashOf(1L)}"),
        s"""{"type":"TAG","hash":"${NessieHttp.hashOf(0L)}"}""")._1 === 200)
      assert(Manifests.loadRefs(Manifests.root(spark, t)).tags("v1") === 0L)
      // 400 a hash naming no committed snapshot; fork tags are internal
      // branch anchors, never client-assignable refs → 404
      assert(put(server.uri("/api/v2/trees/v1"),
        s"""{"type":"TAG","hash":"${NessieHttp.hashOf(77L)}"}""")._1 === 400)
      assert(post(server.uri("/api/v2/trees?name=etl3&type=BRANCH"))._1 === 200)
      assert(put(server.uri("/api/v2/trees/__fork_etl3"),
        s"""{"type":"TAG","hash":"${NessieHttp.hashOf(0L)}"}""")._1 === 404)
    } finally server.stop()
  }

  test("error bodies JSON-escape client-supplied segments and exception text") {
    val t = freshRefTable()
    val server = NessieHttp.start(spark, t)
    try {
      // a malformed guard hash containing a double quote is echoed in the
      // error message — the body must still parse as JSON (mapper.readTree
      // in put() throws on malformed bodies, so reaching the assert IS the
      // proof) with the quote intact in the message value
      val enc = java.net.URLEncoder.encode("""no"hex\""", "UTF-8")
      val (c, b) = put(server.uri(s"/api/v2/trees/main@$enc"),
        s"""{"type":"BRANCH","hash":"${NessieHttp.hashOf(0L)}"}""")
      assert(c === 400)
      assert(b.get("message").asText() === """malformed expected hash: no"hex\""")
    } finally server.stop()
  }
}
