package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts of the round-3b analytics operators: SCD2 run-collapse,
  * LOCF daily gap-fill, deterministic k-means, and the quantile sketch's
  * accuracy against the exact percentile. */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  // (user, ts, event_id, status) — user 1 has a tie at ts=30 and a
  // consecutive-duplicate run; user 2 is a single-status key
  private val log = Seq(
    (1L, 10L, 100L, "a"),
    (1L, 20L, 101L, "a"), // duplicate run: must collapse into the first
    (1L, 30L, 102L, "b"), // tie on ts=30: event_id orders b before a
    (1L, 30L, 103L, "a"),
    (1L, 40L, 104L, "a"), // duplicate of the reopened a-run
    (2L, 15L, 200L, "x")
  ).toDF("user_id", "ts_ms", "event_id", "event_type")

  test("scd2: collapses runs, breaks ties by event id, versions per key, open end") {
    val got = Intervals.scd2(log, "user_id", "ts_ms", "event_id", "event_type")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    assert(got.toSeq == Seq(
      (1L, "a", 10L, 30L, 1L), // run (10,20) collapsed, closed by b@30
      (1L, "b", 30L, 30L, 2L), // tie: b (event 102) precedes a (event 103)
      (1L, "a", 30L, -1L, 3L), // reopened run (30,40) collapsed, open-ended
      (2L, "x", 15L, -1L, 1L)))
  }

  test("scd2: intervals tile each key's timeline (adjacent, no overlap)") {
    val iv = Intervals.scd2(log, "user_id", "ts_ms", "event_id", "event_type")
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap
    iv.foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"gap/overlap between $a and $b")
        case _ => ()
      }
      assert(rows.last._4 == -1L, "last interval must be open-ended")
    }
  }

  test("scd2 reconstructs every event's status on random logs (ScalaCheck)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val event = for {
      u <- Gen.choose(1L, 3L); ts <- Gen.choose(0L, 50L); s <- Gen.oneOf("a", "b", "c")
    } yield (u, ts, s)
    val logs = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, event))
    val prop = forAll(logs) { evs =>
      // unique (user, ts): interval boundaries are then unambiguous
      val rows = evs.distinctBy(e => (e._1, e._2)).zipWithIndex
        .map { case ((u, ts, s), i) => (u, ts, i.toLong, s) }
      val df = rows.toDF("user_id", "ts_ms", "event_id", "event_type")
      val iv = Intervals.scd2(df, "user_id", "ts_ms", "event_id", "event_type")
        .as[(Long, String, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap
      // the interval covering each event's ts carries that event's status
      // (= the last-observation-carried-forward reconstruction)
      rows.forall { case (u, ts, _, _) =>
        val expected = rows.filter(r => r._1 == u && r._2 <= ts).maxBy(_._2)._4
        iv(u).exists(v =>
          v._3 <= ts && (v._4 == -1L || ts < v._4) && v._2 == expected)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }

  test("locfDailyFill: dense grid, forward fill across silent days, observed flags") {
    val day = 86400000L
    val ev = Seq(
      (1L, 0L * day + 5L, 1L, "a"), // day 0
      (1L, 0L * day + 9L, 2L, "b"), // day 0, later → day 0 last = b
      (1L, 3L * day + 1L, 3L, "c"), // day 3 (days 1,2 silent)
      (2L, 1L * day, 4L, "z") // single-day key
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Intervals.locfDailyFill(ev, "user_id", "ts_ms", "event_id", "event_type", day)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0L, "b", 2L, 1L), // last of the day wins, both events counted
      (1L, day, "b", 0L, 0L), // silent day carries b
      (1L, 2 * day, "b", 0L, 0L),
      (1L, 3 * day, "c", 1L, 1L),
      (2L, day, "z", 1L, 1L)))
  }

  test("locfDailyFill: tie on ts within a day resolves by event id (max wins)") {
    val ev = Seq((1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Intervals.locfDailyFill(ev, "user_id", "ts_ms", "event_id", "event_type", 86400000L)
      .select("event_type_filled").as[String].collect()
    assert(got.toSeq == Seq("b"))
  }

  test("kmeans: separable clusters are found and assignment is deterministic") {
    // two tight blobs in 3d, membership by id parity: odd ids near
    // (1,0,0), even ids near (0,1,0) — the lowest-id seeds (ids 1, 2) land
    // one per blob, so k=2, iters=2 must separate them cleanly. Offsets
    // are ≥0.01 so the 1e-3 quantization keeps every vector distinct.
    val vecs = (1 to 20).map { i =>
      if (i % 2 == 1) (i.toLong, Seq(1.0f + i * 0.01f, 0.0f, 0.0f))
      else (i.toLong, Seq(0.0f, 1.0f + i * 0.01f, 0.0f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = KMeans.lloydAssign(df, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    val blobA = (1 to 20 by 2).map(i => got(i.toLong)).toSet
    val blobB = (2 to 20 by 2).map(i => got(i.toLong)).toSet
    assert(blobA.size == 1 && blobB.size == 1 && blobA != blobB,
      s"blobs must map to distinct single clusters: $got")
    val again = KMeans.lloydAssign(df, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == again, "assignment must be deterministic")
  }

  test("lloydCentroids: rounds=0 returns the hash-spread seed; empty clusters drop; trainer ≡ assign path") {
    val vecs = (1 to 20).map(i => (i.toLong,
      Seq(i * 0.01f, (21 - i) * 0.01f, 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    // rounds = 0: exactly k rows, cluster ids 0..k-1, and the vectors are
    // the k first in (md5(id), id) order — the documented seed contract
    val seed = KMeans.lloydCentroids(df, k = 4, rounds = 0)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(seed.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expectedIds = (1 to 20).map(_.toLong).sortBy(id => (hex(id), id)).take(4)
    val quant = df.select(col("vec_id"),
      graft.functions.VectorFunctions.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(seed.map(_._2.toSeq).toSeq == expectedIds.map(id => quant(id).toSeq),
      "seed centroids must be the k first vectors in (md5(id), id) order")
    // lloydAssign(iters) must equal assigning against lloydCentroids(iters-1)
    // — the factored trainer and the public assign path cannot drift
    val viaAssign = KMeans.lloydAssign(df, k = 4, iters = 3)
      .as[(Long, Long)].collect().toMap
    val cents = KMeans.lloydCentroids(df, k = 4, rounds = 2)
      .as[(Long, Seq[Long])].collect()
    val manual = vecs.map { case (id, _) =>
      val v = quant(id)
      id -> cents.map { case (c, cv) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }.toMap
    assert(viaAssign == manual, "trainer centroids must reproduce lloydAssign")
    // clusters that lose every member are DROPPED (contract both the SQL
    // oracle and the IVF build replay): k > points → at most |points|
    // clusters survive a round
    val tiny = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val trained = KMeans.lloydCentroids(tiny, k = 4, rounds = 1).count()
    assert(trained <= 2, s"empty clusters must drop, got $trained")
  }

  test("kmeans: k > distinct points still assigns every vector exactly once") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = KMeans.lloydAssign(df, k = 3, iters = 2).as[(Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("quantile sketch: estimates within 1% of the exact percentile") {
    val df = (1 to 10000).map(i => ("t", i.toLong)).toDF("event_type", "value_c")
    val approx = df.groupBy("event_type")
      .agg(percentile_approx(col("value_c"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .select(explode(col("qs"))).as[Long].collect()
    val exact = Seq(5000L, 9000L, 9900L)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= e / 100 + 1, s"approx $a vs exact $e")
    }
  }

  test("zipf coverage: ranks by count desc, cumulative mass reaches the head total") {
    // build docs where token frequencies are known: 'x' 5 times, 'y' 3, 'z' 2
    val docs = Seq((1L, "x x x y y z"), (2L, "x x y z")).toDF("doc_id", "text")
    // exercise the same plan pieces the query composes
    import graft.functions.TextFunctions._
    val vocab = docs.select(explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val top = vocab.orderBy(col("n").desc, col("token")).limit(3)
    val ranked = Relational.globalIndex(top, Seq(col("n").desc, col("token")), "rank")
    val cum = Relational.globalCumSum(ranked, Seq(col("rank")), col("n"), "cum_n")
      .select("rank", "token", "cum_n").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(cum.toSeq == Seq((1L, "x", 5L), (2L, "y", 8L), (3L, "z", 10L)))
  }
}
