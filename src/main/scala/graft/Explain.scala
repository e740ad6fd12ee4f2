package graft


/** Dev tool: print the formatted physical plan of one or more queries.
  * Usage: runMain graft.Explain <queryName>... [-sf <dir>]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("-sf")
    val sfDir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.01"
    val names = args.filterNot(Seq("-sf", sfDir).contains)
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
