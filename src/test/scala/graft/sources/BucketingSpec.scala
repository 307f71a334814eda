package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Co-located bucketed tables must join with NO shuffle on either side —
  * the storage-layout property the 100 TB plan depends on. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    (p +: kids.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  test("same-key same-count bucketed tables join without any Exchange") {
    val a = (0L until 1000L).map(i => (i % 97, i, s"a$i")).toDF("k", "ai", "av")
    val b = (0L until 500L).map(i => (i % 97, s"b$i")).toDF("k", "bv")
    Bucketing.writeBucketed(a, "buck_a", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(b, "buck_b", "k", 8, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val j = spark.table("buck_a").join(spark.table("buck_b"), "k")
      val n = j.count()
      // each key matches (1000/97-ish) × (500/97-ish) rows; just sanity row count
      assert(n > 0)
      val plan = j.queryExecution.executedPlan match {
        case ap: AdaptiveSparkPlanExec => ap.executedPlan
        case p => p
      }
      val shuffles = collectAll(plan).collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed co-located join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS buck_a")
      spark.sql("DROP TABLE IF EXISTS buck_b")
    }
  }
}
