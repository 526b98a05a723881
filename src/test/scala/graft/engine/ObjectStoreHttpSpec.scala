package graft.engine

import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The networked object store (SURVEY §8's last declared gap, closed):
  * engine ↔ store with a REAL socket in the loop — conditional-PUT
  * semantics over the wire, the one-winner commit race, and a full
  * Layout snapshot lifecycle, all through [[HttpFileIO]] against
  * [[ObjectStoreHttp]]. */
class ObjectStoreHttpSpec extends SparkSpec {

  private def withServer[A](lagMs: Long = 0L)(body: (HttpFileIO, ObjectStoreHttp.Server) => A): A = {
    val server = ObjectStoreHttp.start(new ObjectStoreFileIO(lagMs))
    try body(new HttpFileIO(server.uri), server) finally server.stop()
  }

  private def withIo[A](io: FileIO)(body: => A): A = {
    val prev = Manifests.io
    Manifests.io = io
    try body finally Manifests.io = prev
  }

  test("conditional PUT semantics hold over the socket: create-only, etag match, mismatch, 412") {
    withServer() { (io, _) =>
      val dir = Files.createTempDirectory("oshttp")
      val p = dir.resolve("refs.json")
      assert(io.readBytes(p) === None)
      assert(io.putIfMatch(p, None, "v1".getBytes), "If-None-Match:* create")
      assert(!io.putIfMatch(p, None, "v2".getBytes), "create over existing must 412")
      assert(!io.putIfMatch(p, Some("wrong".getBytes), "v2".getBytes), "etag mismatch must 412")
      assert(io.putIfMatch(p, Some("v1".getBytes), "v2".getBytes), "etag match swaps")
      assert(io.readBytes(p).map(new String(_)) === Some("v2"))
      io.writeAtomic(p, "v3".getBytes) // unconditional PUT
      assert(io.readBytes(p).map(new String(_)) === Some("v3"))
      io.deleteIfExists(p)
      assert(io.readBytes(p) === None)
      io.deleteIfExists(p) // idempotent
    }
  }

  /** Holds refs.json readers at a latch so both racers commit on the
    * same base — the CommitRaceSpec worst case, over the network io. */
  private final class Gated(inner: FileIO, gate: CountDownLatch) extends FileIO {
    override def readBytes(path: Path): Option[Array[Byte]] = {
      val r = inner.readBytes(path)
      if (path.getFileName.toString == "refs.json") {
        gate.countDown()
        gate.await(5, TimeUnit.SECONDS)
      }
      r
    }
    override def writeAtomic(path: Path, bytes: Array[Byte]): Unit =
      inner.writeAtomic(path, bytes)
    override def putIfMatch(path: Path, expected: Option[Array[Byte]],
        bytes: Array[Byte]): Boolean = inner.putIfMatch(path, expected, bytes)
    override def deleteIfExists(path: Path): Unit = inner.deleteIfExists(path)
  }

  test("two commits racing through the socket: one winner, one clean refusal") {
    withServer() { (io, _) =>
      val gate = new CountDownLatch(2)
      withIo(new Gated(io, gate)) {
        val table = "oshttp_race"
        val root = Manifests.root(spark, table)
        def entry(name: String) = Manifests.FileEntry(
          path = name, records = 1L, bytes = 10L,
          lower = Map.empty, upper = Map.empty)
        val results = new java.util.concurrent.ConcurrentHashMap[String, Any]()
        val threads = Seq("a", "b").map { who =>
          new Thread(() => {
            try results.put(who, Manifests.commit(spark, table, s"append-$who",
              basePath = "/tmp/none", schemaJson = "{}",
              files = Seq(entry(s"file-$who.parquet"))))
            catch { case e: Manifests.ConcurrentCommitException => results.put(who, e) }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join(10000))
        val outcomes = Seq(results.get("a"), results.get("b"))
        val wins = outcomes.collect { case s: Long => s }
        val losses = outcomes.collect { case e: Manifests.ConcurrentCommitException => e }
        assert(wins.size === 1, s"expected exactly one winner, got $outcomes")
        assert(losses.size === 1, s"expected exactly one refusal, got $outcomes")
        assert(Manifests.loadRefs(root).head === wins.head)
        assert(Manifests.listSnapshots(root).size === 1)
      }
    }
  }

  test("Layout snapshot lifecycle end-to-end with the store a network hop away") {
    withServer() { (io, _) =>
      withIo(io) {
        val tbl = "oshttp_lifecycle"
        val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
        nation.write.mode("overwrite").saveAsTable(tbl)
        val before = spark.table(tbl).collect()
          .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
        Layout.snapshot(spark, tbl, "v1")
        Layout.overwrite(spark, tbl, nation.filter(col("n_nationkey") < 5))
        assert(spark.table(tbl).count() === 5)
        // the tag still reads the full pre-overwrite rows — manifest and
        // refs resolution both crossed the socket
        val atTag = Layout.readAt(spark, tbl, "v1").collect()
          .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
        assert(atTag === before && before.size === 25)
        // rollback via assignHead (the L19 verb) over the network io
        val head = Manifests.loadRefs(Manifests.root(spark, tbl)).head
        Layout.snapshot(spark, tbl, "v2")
        val head2 = Manifests.loadRefs(Manifests.root(spark, tbl)).head
        assert(head2 > head)
        Layout.assignHead(spark, tbl, head)
        assert(Manifests.loadRefs(Manifests.root(spark, tbl)).head === head)
      }
    }
  }

  test("bucket confinement: keys outside the configured root refuse with 403") {
    val rootDir = Files.createTempDirectory("oshttp-root")
    val server = ObjectStoreHttp.start(new ObjectStoreFileIO(), root = Some(rootDir))
    try {
      val io = new HttpFileIO(server.uri)
      val inside = rootDir.resolve("bucket/refs.json")
      assert(io.putIfMatch(inside, None, "v1".getBytes))
      assert(io.readBytes(inside).map(new String(_)) === Some("v1"))
      // an absolute key outside the root refuses before any FS access —
      // and the client surfaces the refusal as an ERROR, never as
      // "absent" (a 403 treated like 404 would read as a missing object)
      val refused = intercept[IllegalStateException] {
        io.readBytes(Path.of("/etc/passwd"))
      }
      assert(refused.getMessage.contains("403"))
      val raw = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.uri + "/etc/passwd")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(raw.statusCode() === 403)
      // ..-traversal normalizes OUT of the root and refuses too
      val trav = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.uri + rootDir.toString + "/../../etc/passwd"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(trav.statusCode() === 403)
      // a SYMLINK inside the root must not escape it (textual
      // normalize+startsWith alone would pass this request through)
      java.nio.file.Files.createSymbolicLink(
        rootDir.resolve("link"), Path.of("/"))
      val viaLink = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.uri + rootDir.toString + "/link/etc/passwd"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(viaLink.statusCode() === 403)
    } finally server.stop()
  }

  test("visibility lag over the wire: stale GET, authoritative CAS") {
    withServer(lagMs = 300L) { (io, _) =>
      val dir = Files.createTempDirectory("oshttp-lag")
      val p = dir.resolve("refs.json")
      io.writeAtomic(p, "v1".getBytes)
      Thread.sleep(400L)
      assert(io.putIfMatch(p, Some("v1".getBytes), "v2".getBytes))
      // within the lag window the socket serves the stale read...
      assert(io.readBytes(p).map(new String(_)) === Some("v1"))
      // ...but the service-side CAS judges authoritative v2
      assert(!io.putIfMatch(p, Some("v1".getBytes), "v3".getBytes))
      Thread.sleep(400L)
      assert(io.readBytes(p).map(new String(_)) === Some("v2"))
    }
  }
}
