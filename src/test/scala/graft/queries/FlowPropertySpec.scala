package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

import graft.SparkSpec
import graft.streaming.TransitionStream

/** Property tests for the wave-9+ flow operators: the Spark plans must
  * agree with direct JVM reimplementations of the integer semantics on
  * randomized inputs — many seeds, not one fixture. */
class FlowPropertySpec extends SparkSpec {

  import spark.implicits._

  private val graphGen = for {
    n <- Gen.choose(2, 18)
    density <- Gen.choose(1, 4)
    edges <- Gen.listOfN(n * density,
      Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield (n, edges.distinct.filter { case (a, b) => a != b })

  test("integer PageRank over random graphs == direct JVM replay (ScalaCheck)") {
    val scale = FlowQueries.PrScale
    val prop = forAll(graphGen) { case (n, edges) =>
      val nodes = 0L until n.toLong
      // direct replay of the documented integer recurrence
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var pr = nodes.map(_ -> scale).toMap
      (1 to FlowQueries.PrRounds).foreach { _ =>
        val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        edges.foreach { case (s, d) => in(d) += pr(s) * 85L / (100L * outdeg(s)) }
        pr = nodes.map(v => v -> (15L * scale / 100L + in(v))).toMap
      }
      // the Spark side, lifted out of q131: same node/edge frames
      val nodeDf = nodes.toDF("vec_id")
      val edgeDf = edges.toDF("src", "dst")
      val od = edgeDf.groupBy("src").agg(count(lit(1)).as("outdeg"))
      var prDf = nodeDf.withColumn("pr", lit(scale))
      (1 to FlowQueries.PrRounds).foreach { _ =>
        val contrib = edgeDf.join(od, "src")
          .join(prDf.select(col("vec_id").as("src"), col("pr")), "src")
          .select(col("dst"), expr("(pr * 85) div (100 * outdeg)").as("c"))
          .groupBy("dst").agg(sum("c").as("in_mass"))
        prDf = nodeDf.join(contrib.select(col("dst").as("vec_id"), col("in_mass")),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            (lit(15L * scale / 100L) + coalesce(col("in_mass"), lit(0L))).as("pr"))
      }
      val got = prDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == pr
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  private val eventsGen = for {
    nUsers <- Gen.choose(1, 4)
    n <- Gen.choose(4, 40)
    types <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, nUsers.toLong), Gen.oneOf("a", "b", "c")))
    split <- Gen.choose(1, n - 1)
  } yield (types.zipWithIndex.map { case ((u, ty), i) =>
    // per-user in-order arrival: ts strictly grows with arrival index
    (u, 1000L + i * 10L, i.toLong, ty)
  }, split)

  test("streaming transitions == batch lag under random batch splits (ScalaCheck)") {
    implicit val ctx = spark.sqlContext
    val prop = forAll(eventsGen) { case (all, split) =>
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String)]
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long, Long)]
      val q = TransitionStream.transitions(
        ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
        .writeStream.outputMode("append")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[TransitionStream.Transition], _: Long) =>
            rows.synchronized {
              rows ++= ds.collect().map(t =>
                (t.user_id, t.from_type, t.to_type, t.ts_ms, t.event_id))
            }
            ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-transp-ckpt").toString)
        .start()
      try {
        Seq(all.take(split), all.drop(split)).filter(_.nonEmpty)
          .foreach { b => ms.addData(b); q.processAllAvailable() }
        val expect = all.groupBy(_._1).values.flatMap { evs =>
          val s = evs.sortBy(e => (e._2, e._3))
          s.zip(s.tail).map { case (a, b) => (a._1, a._4, b._4, b._2, b._3) }
        }.toSet
        rows.toSet == expect
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
