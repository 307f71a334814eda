package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Runtime bloom-filter injection — the Spark knob that turns a selective
  * dimension predicate into a pre-shuffle semi-filter on the fact side of
  * a star join (`spark.sql.optimizer.runtime.bloomFilter.enabled`). At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching slice; the cluster deployment notes enable
  * it, and this spec pins that the rewrite actually fires on this
  * engine's join shapes so a Spark upgrade can't silently drop it. */
class RuntimeFilterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom might_contain on the fact scan side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the non-broadcast path: broadcast joins reuse the exact
      // keys instead (InjectRuntimeFilter only fires on shuffle joins)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = Tables.lineitem(spark, sfDir)
      val orders = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_extendedprice").as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"expected an injected bloom runtime filter, optimized plan:\n$optimized")
      // and the result is unchanged by the (superset) filter; the two plans
      // may order partial double sums differently, so compare with a
      // relative tolerance instead of exact bit equality
      val expect = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_extendedprice").as("rev"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      }
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - expect(k)) <= 1e-9 * math.max(1.0, math.abs(expect(k))),
          s"rev for $k: $v vs ${expect(k)}")
      }
    }
  }
}
