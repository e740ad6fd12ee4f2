package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that throws leaves NO parquet dir, and the driver compare
  * skips queries without a dump — so a crash would silently drop the key
  * from the correctness report instead of failing it (this masked a
  * round-3 regression). Every failure therefore also writes an
  * `_errors/<name>.txt` marker plus a `_verify_errors.json` summary
  * (underscore-prefixed so no `q*` glob over the dump dir can mistake
  * them for result dirs), and the process says so loudly on stderr; a
  * clean round has neither. scripts/check.py cross-checks the registry
  * against the dump dir, so a missing key reads as FAIL, not pass.
  */
object Verify {
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
          None
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getName}: ${e.getMessage}"
          System.err.println(s"[verify] $name FAILED: $msg")
          try {
            new java.io.File(s"$outDir/_errors").mkdirs()
            Files.writeString(Paths.get(s"$outDir/_errors/$name.txt"), msg)
          } catch { case _: Throwable => () }
          Some(name -> msg)
        }
    }
    if (failures.nonEmpty) {
      val errJson = failures
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), errJson)
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
