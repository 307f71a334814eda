package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 envelope-guard sweep (round-10 VERDICT #5): every packed-
  * BIGINT site either proves its bound by construction or fails loudly
  * at runtime — README's "Packed-key sites × guard status" table is the
  * inventory; this spec pins one representative runtime failure (the
  * shared priority formula) and one build-time failure class.
  */
class PackEnvelopeSpec extends SparkSpec {

  test("priority formula fails loudly past the weight envelope, exact inside it") {
    import spark.implicits._
    val inRange = Seq((1L, 100L), (2L, 2147483647L)).toDF("doc_id", "weight")
      .withColumn("u", lit(7L))
      .withColumn("priority",
        graft.streaming.PrioritySampleStream
          .priorityExpr(42L, "doc_id", "weight").as("priority"))
    // in-envelope rows compute (no throw) and stay positive BIGINTs
    val got = inRange.select("priority").collect().map(_.getLong(0))
    assert(got.forall(_ >= 0L), s"in-envelope priority went negative: ${got.toSeq}")
    val outOfRange = Seq((3L, 2147483648L)).toDF("doc_id", "weight")
      .withColumn("priority",
        graft.streaming.PrioritySampleStream
          .priorityExpr(42L, "doc_id", "weight").as("priority"))
    val ex = intercept[Exception] { outOfRange.select("priority").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("envelope")),
      s"expected the envelope raise_error, got: ${ex.getMessage}")
  }

  test("q327's shard-count pack envelope is a build-time constant check") {
    // the shipped constant is inside the envelope — the query builds
    val df = LifecycleQueries.q327_rendezvous_rebalance(
      spark, "/root/testdata/sf0.001")
    assert(df.columns.contains("scheme"))
    // and the envelope itself is the documented 16-candidate bound
    assert(LifecycleQueries.OldShards + 1 <= 16)
  }
}
