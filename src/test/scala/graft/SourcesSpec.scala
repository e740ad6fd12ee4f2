package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV, JSON lines, ORC and
  * the raw text source must round-trip the fixture data bit-exactly
  * (explicit schemas — an engine never trusts inference for contract
  * data), and the columnar formats must keep predicate pushdown working
  * so format choice does not silently cost scan pruning.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("csv: header + explicit schema round-trips part exactly") {
    val src = Tables.load(spark, sf, "part")
    val dir = tmp("csv")
    // quote/escape defaults must survive commas and quotes in p_name
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(src.schema) // inference would widen int32 -> int
      .csv(dir)
    assertSameRows(src, back)
  }

  test("json lines: nested struct + array columns round-trip") {
    val src = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        struct(col("n_chars"), length(col("text")).as("len")).as("meta"),
        split(col("text"), " ").as("tok"))
    val dir = tmp("json")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assertSameRows(src, back)
  }

  test("orc: round-trips lineitem slice and keeps predicate pushdown") {
    val src = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_returnflag")
    val dir = tmp("orc")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assertSameRows(src, back)
    val filtered = back.filter(col("l_quantity") > 25.0)
      .select("l_orderkey", "l_quantity")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,25.0)]"),
      s"ORC scan lost predicate pushdown:\n$scan")
    assert(filtered.count() ==
      src.filter(col("l_quantity") > 25.0).count())
  }

  test("text source reads raw lines (one row per document line)") {
    val src = Tables.load(spark, sf, "documents").select("text")
    val dir = tmp("text")
    src.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    // fixture texts are single-line, so line count == doc count and the
    // multiset of lines matches exactly
    assertSameRows(src.withColumnRenamed("text", "value"), back)
  }
}
