package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSuite {

  test("q1 aggregates reconcile with raw lineitem") {
    val out = Analytics.q1Pricing(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
    assert(out.map(_.getAs[Long]("count_order")).sum == li.count())
    val totalQty = li.agg(sum(col("l_quantity"))).head().getDouble(0)
    assert(math.abs(out.map(_.getAs[Double]("sum_qty")).sum - totalQty) < 1e-6)
  }

  test("semi + anti join partition the customer table for unfiltered orders") {
    val semi = Analytics.semiJoin(spark, sf).count()
    val cust = Tables.customer(spark, sf).count()
    // anti joins on orders > 400k; reconcile directly
    val anti = Analytics.antiJoin(spark, sf).count()
    val withBig = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0).select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + withBig == cust)
    assert(semi <= cust)
  }

  test("rollup contains per-group, subtotal and grand-total rows") {
    val out = Analytics.rollupFlags(spark, sf).collect()
    val grand = out.filter(r => r.getAs[String]("returnflag") == "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_lines") == Tables.lineitem(spark, sf).count())
    val subtotals = out.filter(r => r.getAs[String]("returnflag") != "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(subtotals.nonEmpty)
  }

  test("window running sum is monotone per customer") {
    val rows = Analytics.windowRunning(spark, sf)
      .orderBy("o_custkey", "order_day", "o_orderkey").collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val sums = rs.map(_.getAs[Double]("cum_spend"))
      assert(sums.sliding(2).forall { case Array(a, b) => b >= a; case _ => true })
    }
  }

  test("topk parts are the true top by revenue") {
    val topk = Analytics.topkParts(spark, sf, 3).collect().map(_.getAs[Double]("revenue"))
    assert(topk.length == 3 && topk.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
