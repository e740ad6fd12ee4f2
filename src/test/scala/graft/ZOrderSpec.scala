package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order clustering: bit-exact interleave values and the quantified
  * data-skipping property — z-sorted slabs keep BOTH key axes narrow,
  * a single-key sort leaves the other axis spanning the full domain.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 matches the reference interleave bit-for-bit") {
    // cross-checked against a python reference and the DuckDB ladder
    val got = Seq((12345L, 54321L), (0L, 0L), (65535L, 65535L), (1L, 2L))
      .toDF("x", "y")
      .select(ZOrder.zorder2(col("x"), col("y"))).as[Long].collect().toSeq
    assert(got == Seq(2803896131L, 0L, 4294967295L, 9L))
    // 9 = x bit0 at even pos (1) + y bit1 at odd pos (8)
  }

  test("zorder2 masks inputs to 16 bits") {
    val got = Seq((65536L + 7L, (1L << 40) + 3L)).toDF("x", "y")
      .select(ZOrder.zorder2(col("x"), col("y"))).as[Long].head()
    val ref = Seq((7L, 3L)).toDF("x", "y")
      .select(ZOrder.zorder2(col("x"), col("y"))).as[Long].head()
    assert(got == ref)
  }

  test("z-sorted slabs keep BOTH axes narrow; a 1-key sort does not") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"))
    val st = orders.agg(min("ck"), max("ck"), min("ok"), max("ok")).head()
    val (ck0, ckDomain) = (st.getLong(0), st.getLong(1) - st.getLong(0))
    val (ok0, okDomain) = (st.getLong(2), st.getLong(3) - st.getLong(2))

    def avgSpans(slabbed: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = slabbed.groupBy("slab")
        .agg((max("ck") - min("ck")).as("cks"), (max("ok") - min("ok")).as("oks"))
        .agg(avg("cks"), avg("oks")).head()
      (r.getDouble(0), r.getDouble(1))
    }

    // z-order layout: range-normalize both keys to the 16-bit grid,
    // then slab by z-range (what a z-sorted writer would do)
    val (zCk, zOk) = avgSpans(orders
      .withColumn("z", ZOrder.zorder2(
        expr(s"((ck - $ck0) * 65535) div $ckDomain"),
        expr(s"((ok - $ok0) * 65535) div $okDomain")))
      .withColumn("slab", expr("z div 67108864")))
    // single-key layout: sort by ok only, same slab count via ok ranges
    val (sCk, _) = avgSpans(orders
      .withColumn("slab", expr(s"ok div ${math.max(1L, (okDomain + 1) / 64)}")))

    // both axes narrow under z-order (the sqrt(slabs) guarantee, with
    // slack for partially-filled slabs)...
    assert(zCk < ckDomain / 2.0,
      s"z-slab custkey span $zCk must be well under the domain $ckDomain")
    assert(zOk < okDomain / 2.0,
      s"z-slab orderkey span $zOk must be well under the domain $okDomain")
    // ...while the 1-key sort leaves the OTHER axis near full-domain
    assert(sCk > ckDomain * 0.8,
      s"ok-sorted slabs should span ~the full custkey domain ($sCk vs $ckDomain)")
    assert(zCk < sCk / 2.0,
      "z-order must at least halve the non-leading axis span vs a 1-key sort")
  }
}
