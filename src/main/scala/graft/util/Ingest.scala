package graft.util

import java.io.{File, FileOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Driver-side ingest utilities mirroring the reference's orchestration
  * helpers (SURVEY.md §2-A A3/A35; reference
  * luigi_tasks.py:75-117,45-51): zip extraction with single-root
  * stripping, and idempotent completion markers. Pure JVM (zero-egress
  * environment: the A2/A4 authenticated/chunked downloads are a
  * production concern, not reproducible here).
  */
object Ingest {

  /** Extract `zip` under `dest`. If every entry lives under one common
    * root directory, that root is stripped during extraction (the
    * reference's single-root fast path). Returns extracted file count. */
  def unzipWithRootStrip(zip: File, dest: File): Int = {
    val zf = new ZipFile(zip)
    try {
      val entries = zf.entries().asScala.toList
      val names = entries.filterNot(_.isDirectory).map(_.getName)
      val roots = names.map(_.takeWhile(_ != '/')).distinct
      val hasSingleRoot = roots.size == 1 &&
        names.forall(_.startsWith(roots.head + "/"))
      var n = 0
      entries.filterNot(_.isDirectory).foreach { e =>
        val rel = if (hasSingleRoot) e.getName.drop(roots.head.length + 1)
                  else e.getName
        val out = new File(dest, rel)
        // zip-slip guard: resolved path must stay under dest. The
        // trailing separator matters — a bare prefix check would admit
        // escapes into SIBLING dirs sharing the prefix (dest=/data/out
        // vs entry resolving to /data/out2/evil).
        require(out.getCanonicalPath == dest.getCanonicalPath ||
          out.getCanonicalPath.startsWith(
            dest.getCanonicalPath + File.separator),
          s"zip entry escapes destination: ${e.getName}")
        out.getParentFile.mkdirs()
        val in = zf.getInputStream(e)
        val os = new FileOutputStream(out)
        try { in.transferTo(os); n += 1 } finally { os.close(); in.close() }
      }
      n
    } finally zf.close()
  }

  /** Production shim for the reference's dataset downloads (SURVEY.md
    * §2-A A2/A4; reference luigi_tasks.py:34-130,301-325): streaming
    * HTTP download with resume-on-retry, atomic completion.
    *
    * Shape over features: bytes stream straight to a `.part` file (no
    * in-memory buffering — archives are GBs), an interrupted transfer
    * resumes with a `Range` request if the server honors it (206) and
    * restarts cleanly if not (200), and the final rename is atomic so a
    * half-written file can never be mistaken for a finished download.
    * The client is injectable, so the test drives it against an
    * in-process HttpServer — zero egress. Returns total bytes on disk.
    */
  def download(url: URI, dest: File,
      client: HttpClient = HttpClient.newHttpClient(),
      maxAttempts: Int = 3): Long = {
    val part = new File(dest.getPath + ".part")
    Option(dest.getParentFile).foreach(_.mkdirs())
    var attempt = 0
    var done = false
    var lastErr: Throwable = null
    while (!done && attempt < maxAttempts) {
      attempt += 1
      try {
        val have = if (part.exists()) part.length() else 0L
        val req = HttpRequest.newBuilder(url)
        if (have > 0) req.header("Range", s"bytes=$have-")
        val resp = client.send(req.build(),
          HttpResponse.BodyHandlers.ofInputStream())
        val code = resp.statusCode()
        if (code == 206 && have > 0) {
          val os = Files.newOutputStream(part.toPath,
            StandardOpenOption.APPEND)
          try resp.body().transferTo(os) finally os.close()
        } else if (code == 200) {
          val os = Files.newOutputStream(part.toPath,
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          try resp.body().transferTo(os) finally os.close()
        } else sys.error(s"HTTP $code for $url")
        done = true
      } catch { case e: Throwable => lastErr = e }
    }
    if (!done)
      throw new java.io.IOException(
        s"download failed after $maxAttempts attempts: $url", lastErr)
    Files.move(part.toPath, dest.toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    dest.length()
  }

  /** Idempotent unit of work gated by a marker file (the reference's
    * LocalTarget pattern): `work` runs only if `marker` is absent, and
    * the marker is written only after success. Returns true if work ran. */
  def withCompletionMarker(marker: File)(work: => Unit): Boolean =
    if (marker.exists()) false
    else {
      work
      Option(marker.getParentFile).foreach(_.mkdirs())
      java.nio.file.Files.write(marker.toPath,
        java.time.Instant.now().toString.getBytes)
      true
    }

  /** A driver-side task with marker-gated idempotence and upstream
    * dependencies (the reference's `requires()` pattern,
    * luigi_tasks.py:328-347). */
  case class Task(name: String, marker: File, deps: Seq[String] = Nil)(
      val work: () => Unit)

  /** Topological-order DAG runner over marker-gated tasks: each task runs
    * once all its dependencies are complete, and only if its own marker
    * is absent — so a re-run after a partial failure resumes exactly
    * where it stopped (already-marked tasks are zero work). Returns the
    * names of tasks whose work actually ran, in execution order.
    *
    * Deliberately driver-side and tiny: the heavy lifting inside each
    * task is a Spark job; this only sequences job submission the way the
    * reference's scheduler sequences its tasks. Cycles and unknown
    * dependency names fail fast. */
  def runDag(tasks: Seq[Task]): Seq[String] = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.flatMap(_.deps).foreach(d =>
      require(byName.contains(d), s"unknown dependency: $d"))
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val done = scala.collection.mutable.Set[String]()
    val visiting = scala.collection.mutable.Set[String]()
    def visit(t: Task): Unit =
      if (!done.contains(t.name)) {
        require(visiting.add(t.name), s"dependency cycle at: ${t.name}")
        t.deps.foreach(d => visit(byName(d)))
        if (withCompletionMarker(t.marker)(t.work())) ran += t.name
        visiting.remove(t.name)
        done += t.name
      }
    tasks.foreach(visit)
    ran.toSeq
  }
}
