package graft
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that throws leaves NO parquet dir, and the driver compare
  * skips queries without a dump — so a crash would silently drop the key
  * from the correctness report instead of failing it (this masked a
  * round-3 regression). Every failure therefore also writes an
  * `_errors/<name>.txt` marker plus a `_verify_errors.json` summary,
  * and the process says so loudly on stderr; a clean round has neither.
  * scripts/check.py cross-checks the registry against the dump dir, so a
  * missing key reads as FAIL, not pass.
  *
  * Sidecars and error markers live in a SIBLING of the dump dir
  * (`<outDir>/../graft_meta_<basename>/`), never inside it: round 10
  * proved the driver enumerates EVERY entry under the dump dir as a
  * parquet query dump (the underscore prefix did not exempt
  * `_colhash/` — it produced a stray pyarrow-traceback key in
  * CORRECTNESS_r10.json, and on a failing round `_errors/` would have
  * turned one real failure into N confusing ones). The basename key
  * (round 12) stops sibling dump dirs under one parent from sharing —
  * and cross-sweeping — one meta dir. The dump dir itself contains
  * exclusively `q*` parquet dirs plus the contract-mandated
  * oracle_sql.json.
  */
object Verify {
  /** Canonical string form of one output value, shared (by contract,
    * not by code) with `canon()` in scripts/check.py: when a DRIVER
    * hash fails but the local compare passes (round 9's q136), the
    * per-column sidecar hashes below name the divergent COLUMN instead
    * of costing a round of guessing (VERDICT r9 task 2). Floats go out
    * as raw IEEE-754 bit patterns (NaN spelled out) so no decimal
    * formatter is in the loop; timestamps as epoch micros; decimals as
    * plain strings — every rule chosen because Python can reproduce it
    * exactly from DuckDB's fetchall values.
    */
  private[graft] def canon(v: Any): String = v match {
    case null => "∅"
    case b: Boolean => if (b) "true" else "false"
    case f: Float => canon(f.toDouble) // float→double widening is exact
    case d: Double =>
      if (d.isNaN) "NaN"
      else f"${java.lang.Double.doubleToLongBits(d)}%016x"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case d: java.sql.Date => d.toLocalDate.toString
    case d: java.time.LocalDate => d.toString
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case t: java.time.LocalDateTime =>
      // TimestampNTZ surfaces as LocalDateTime; the Python mirror sees
      // a naive datetime and treats it as UTC — match that here
      canon(t.toInstant(java.time.ZoneOffset.UTC))
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case a: scala.collection.Seq[_] =>
      a.map(canon).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canon).mkString("{", ",", "}")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "=" + canon(x) }
        .sorted.mkString("<", ",", ">")
    case other => other.toString // integral types and strings
  }

  /** column name → md5 of the NUL-joined canonical value stream in dump
    * row order, computed from the parquet actually written (so the
    * sidecar hashes exactly the bytes the driver compares). */
  private[graft] def columnHashes(
      df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long)] = {
    val cols = df.columns
    val digests = cols.map(_ => MessageDigest.getInstance("MD5"))
    var rows = 0L
    // driver-side iteration is the point here: Verify is the dump tool
    // (single coalesced file, sf0.01), not a library operator
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      var i = 0
      while (i < cols.length) {
        digests(i).update(canon(row.get(i)).getBytes("UTF-8"))
        digests(i).update(0.toByte)
        i += 1
      }
      rows += 1
    }
    cols.zipWithIndex.map { case (c, i) =>
      (c, digests(i).digest().map(x => f"$x%02x").mkString, rows)
    }.toSeq
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // match Bench: default to the machine's core count so dev runs and
    // driver runs execute under the same parallelism
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // sibling of the dump dir — NEVER inside it (see the header comment;
    // the driver reads every dump-dir entry as a parquet dataset) —
    // and KEYED by the dump dir's basename: two dump dirs sharing a
    // parent (a driver run next to a dev run) would otherwise share one
    // meta dir, so run A's up-front marker sweep could erase run B's
    // live failure diagnosis and check.py could read the other run's
    // sidecars (ADVICE r11).
    val dumpPath = Paths.get(outDir).toAbsolutePath.normalize
    val metaDir = dumpPath
      .resolveSibling(s"graft_meta_${dumpPath.getFileName}").toString
    new java.io.File(metaDir).mkdirs()
    // the meta dir persists across runs (it is deliberately outside
    // whatever cleanup the driver does to the dump dir), so clear the
    // FAILURE markers up front: a stale _errors/<q>.txt from an old run
    // must never be read as this run's crash diagnosis. Per-query
    // _colhash sidecars need no sweep — each run overwrites its own,
    // and the checker only reads sidecars for queries it has dumps for.
    Option(new java.io.File(s"$metaDir/_errors").listFiles())
      .foreach(_.foreach(_.delete()))
    Files.deleteIfExists(Paths.get(s"$metaDir/_verify_errors.json"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dev-loop subset (mirrors Bench): SPARK_GRAFT_ONLY=q114_x,q37_y
    // dumps just those queries; pass the same list to scripts/check.py.
    // Unset = full inventory (the driver's path).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failures = selected.flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // per-column canonical hash sidecar (VERDICT r9 task 2):
          // hashed from the parquet just written so row order is the
          // dump's own; a driver-vs-local divergence next round reads
          // as "column X differs", not "some hash differs"
          try {
            new java.io.File(s"$metaDir/_colhash").mkdirs()
            // drop the previous run's sidecar BEFORE hashing: if this
            // rewrite throws below, a stale hash must read as "no
            // sidecar", never as this run's column diagnosis
            Files.deleteIfExists(Paths.get(s"$metaDir/_colhash/$name.json"))
            val hashes = columnHashes(spark.read.parquet(s"$outDir/$name"))
            val body = hashes
              .map { case (c, h, _) => s"${q(c)}: ${q(h)}" }
            val rows = hashes.headOption.map(_._3).getOrElse(0L)
            Files.writeString(Paths.get(s"$metaDir/_colhash/$name.json"),
              (body :+ s"${q("_rows")}: $rows").mkString("{", ",", "}"))
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name sidecar failed: $e")
          }
          None
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getName}: ${e.getMessage}"
          System.err.println(s"[verify] $name FAILED: $msg")
          try {
            new java.io.File(s"$metaDir/_errors").mkdirs()
            Files.writeString(Paths.get(s"$metaDir/_errors/$name.txt"), msg)
          } catch { case _: Throwable => () }
          Some(name -> msg)
        }
    }
    if (failures.nonEmpty) {
      val errJson = failures
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$metaDir/_verify_errors.json"), errJson)
      System.err.println(
        s"[verify] ${failures.size}/${SparkEntry.queries.size} queries FAILED: " +
          failures.map(_._1).mkString(", "))
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
