package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import HeavyHittersStream._

/** Misra–Gries streaming heavy hitters: presence of true heavy hitters,
  * the undercount bound, bounded state, and cross-batch accumulation. */
class HeavyHittersStreamSpec extends SparkSpec {

  import spark.implicits._

  private def run(batches: Seq[Seq[TokenEvent]], capacity: Int, emitK: Int)
      : Map[String, Map[String, Long]] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[TokenEvent]
    // latest estimates per group (update mode: later batches overwrite)
    val latest = scala.collection.concurrent.TrieMap.empty[String, Map[String, Long]]
    val q = heavyHitters(ms.toDS(), capacity, emitK)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[HHEstimate], _: Long) =>
        ds.collect().groupBy(_.group).foreach { case (g, es) =>
          latest(g) = es.map(e => e.token -> e.minCount).toMap
        }
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-hh-ckpt").toString)
      .start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      latest.toMap
    } finally q.stop()
  }

  // skewed stream: token "hot" 60×, "warm" 25×, 40 distinct noise tokens 1× each
  private val skewed = {
    val rnd = new scala.util.Random(5)
    rnd.shuffle(
      Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++ (1 to 40).map(i => s"noise$i"))
      .map(t => TokenEvent("g", t))
  }

  test("true heavy hitters survive with near-exact counts; error bound holds") {
    val n = skewed.size // 125
    val capacity = 24 // bound = N/(cap+1) = 5
    val got = run(skewed.grouped(30).toSeq, capacity, emitK = 5)("g")
    val bound = n / (capacity + 1)
    assert(got.contains("hot") && got.contains("warm"),
      s"tokens with count > $bound must be present: $got")
    assert(got("hot") <= 60 && got("hot") >= 60 - bound, s"hot estimate ${got("hot")}")
    assert(got("warm") <= 25 && got("warm") >= 25 - bound, s"warm estimate ${got("warm")}")
  }

  test("state stays bounded by capacity whatever the vocabulary") {
    val many = (1 to 500).map(i => TokenEvent("g", s"t${i % 200}"))
    val capacity = 10
    val got = run(Seq(many), capacity, emitK = 200)("g")
    assert(got.size <= capacity, s"kept ${got.size} counters for capacity $capacity")
  }

  test("groups are independent and merge across batches") {
    val a = Seq.fill(10)(TokenEvent("a", "x")) ++ Seq.fill(2)(TokenEvent("a", "y"))
    val b = Seq.fill(7)(TokenEvent("b", "z"))
    // split each group's events across batches: counts must accumulate
    val got = run(Seq(a.take(6) ++ b.take(3), a.drop(6) ++ b.drop(3)), 8, 3)
    assert(got("a")("x") == 10L && got("a")("y") == 2L)
    assert(got("b")("z") == 7L)
    assert(!got("a").contains("z"))
  }
}
