package graft

import graft.util.Ingest
import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Ingest utility semantics (A3 single-root strip, A35 markers). */
class IngestSpec extends AnyFunSuite {

  private def makeZip(entries: Map[String, String]): File = {
    val f = File.createTempFile("ingest", ".zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes)
      z.closeEntry()
    }
    z.close()
    f
  }

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("ingest-out").toFile

  test("single-root archives are extracted with the root stripped") {
    val zip = makeZip(Map(
      "dataset/a/x.txt" -> "one", "dataset/b/y.txt" -> "two"))
    val dest = tmpDir()
    assert(Ingest.unzipWithRootStrip(zip, dest) == 2)
    assert(new File(dest, "a/x.txt").exists())
    assert(new File(dest, "b/y.txt").exists())
    assert(!new File(dest, "dataset").exists())
  }

  test("multi-root archives keep their layout") {
    val zip = makeZip(Map("a/x.txt" -> "one", "b/y.txt" -> "two"))
    val dest = tmpDir()
    Ingest.unzipWithRootStrip(zip, dest)
    assert(new File(dest, "a/x.txt").exists())
    assert(new File(dest, "b/y.txt").exists())
  }

  test("zip-slip entries are rejected") {
    // two roots so no root-strip applies; the first entry escapes dest
    val zip = makeZip(Map("a/../../evil.txt" -> "nope", "b/ok.txt" -> "fine"))
    val dest = tmpDir()
    intercept[IllegalArgumentException] {
      Ingest.unzipWithRootStrip(zip, dest)
    }
    assert(!new File(dest.getParentFile, "evil.txt").exists())
  }

  test("completion marker makes work idempotent, only written on success") {
    val marker = new File(tmpDir(), "done.marker")
    var runs = 0
    assert(Ingest.withCompletionMarker(marker) { runs += 1 })
    assert(!Ingest.withCompletionMarker(marker) { runs += 1 })
    assert(runs == 1 && marker.exists())

    val marker2 = new File(tmpDir(), "fail.marker")
    intercept[RuntimeException] {
      Ingest.withCompletionMarker(marker2) { throw new RuntimeException("boom") }
    }
    assert(!marker2.exists(), "marker must not exist after failed work")
  }
}
