package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Relational._

/** Direct unit tests for the generic relational operators (SURVEY §2.1's
  * O2/O3/O7/O9/O10/O11/O17 building blocks) on hand-built frames — the
  * query-level oracle checks exercise them end-to-end; these pin the
  * operator contracts in isolation. */
class RelationalSpec extends SparkSpec {

  import spark.implicits._

  private def df = Seq(
    // (id, key, ts, kind, payload)
    ("e1", "k1", 100L, "a", "p1"),
    ("e2", "k1", 300L, "b", "p2"),
    ("e3", "k1", 300L, "a", null),
    ("e4", "k2", 50L, "c", "p4"),
    ("e1", "k1", 100L, "a", "p1") // duplicate delivery of e1
  ).toDF("id", "key", "ts", "kind", "payload")

  test("filterIn keeps only listed values (O3)") {
    assert(filterIn(df, "kind", Seq("a")).count() == 3)
  }

  test("resumeSeek drops the log prefix (O2)") {
    assert(resumeSeek(df, "ts", 100L).count() == 4)
    assert(resumeSeek(df, "ts", 301L).count() == 0)
  }

  test("dedupFirstPerKey keeps exactly one row per key, first by ordering (O7)") {
    val out = dedupFirstPerKey(df, Seq("id"), Seq(col("ts"), col("id")))
    assert(out.count() == 4)
    assert(out.filter(col("id") === "e1").count() == 1)
  }

  test("argMaxPerKey returns the payload of the latest row, ties by tiebreak (O10)") {
    val out = df.groupBy("key")
      .agg(argMaxPerKey(col("ts"), col("id"), col("kind"), "last_kind"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // k1: ts=300 tie between e2/e3 → max id e3 wins → kind "a"
    assert(out == Map("k1" -> "a", "k2" -> "c"))
  }

  test("lastNonNullPerKey skips nulls but keeps ordering semantics (O11)") {
    val out = df.groupBy("key")
      .agg(lastNonNullPerKey(col("payload"), col("ts"), col("id"), "last_p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // k1: latest (300,e3) has null payload → falls back to (300,e2)="p2"
    assert(out == Map("k1" -> "p2", "k2" -> "p4"))
  }

  test("caseMap maps listed keys and defaults the rest (O9)") {
    val out = df.select(col("kind"), caseMap(col("kind"), Seq("a" -> "A", "b" -> "B"), "Z").as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(out == Set("a" -> "A", "b" -> "B", "c" -> "Z"))
  }

  test("checkpointCadence marks every Nth row in total order (O17)") {
    val out = checkpointCadence(df.dropDuplicates("id"), Seq(col("ts"), col("id")), 2)
      .select("checkpoint_seq", "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    // order: e4(50), e1(100), e2(300), e3(300) → rows 2 and 4 marked
    assert(out == Seq(2L -> "e1", 4L -> "e3"))
  }

  test("globalCumSum equals a sequential running sum across many partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 1000).map(i => (i.toLong, rnd.nextInt(100).toLong))
    val in = spark.createDataFrame(rows).toDF("k", "v").repartition(16)
    val got = globalCumSum(in, Seq(col("k")), col("v"), "cum")
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, v) =>
      acc += v
      assert(got(k) == acc, s"k=$k")
    }
  }

  test("funnel: stages count only at-or-after the previous stage's first reach") {
    val events = Seq(
      // u1: click(10) BEFORE view(20) must not count; click(30) after does;
      //     purchase(25) before the qualified click must not count
      ("u1", 10L, "click"), ("u1", 20L, "view"), ("u1", 25L, "purchase"),
      ("u1", 30L, "click"), ("u1", 40L, "purchase"),
      // u2: full funnel in order
      ("u2", 1L, "view"), ("u2", 2L, "click"), ("u2", 3L, "purchase"),
      // u3: never views → nothing downstream counts
      ("u3", 5L, "click"), ("u3", 6L, "purchase")
    ).toDF("user", "ts", "etype").withColumn("eid", col("ts"))
    val out = funnel(events, Seq("user"), col("ts"), col("eid"),
      Seq("view" -> (col("etype") === "view"),
        "click" -> (col("etype") === "click"),
        "purchase" -> (col("etype") === "purchase")))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("u1") == (Some(20L), Some(30L), Some(40L)))
    assert(out("u2") == (Some(1L), Some(2L), Some(3L)))
    assert(out("u3") == (None, None, None))
  }

  test("funnel ties at the same timestamp resolve by the tiebreak column") {
    // view and click at the SAME ts: click's eid is larger → view sorts
    // first → click qualifies; reversed eids → it must not
    val ev = Seq(("u", 10L, 1L, "view"), ("u", 10L, 2L, "click")).toDF("user", "ts", "eid", "etype")
    val out = funnel(ev, Seq("user"), col("ts"), col("eid"),
      Seq("view" -> (col("etype") === "view"), "click" -> (col("etype") === "click")))
      .collect().head
    assert(Option(out.get(2)) == Some(10L))
    val ev2 = Seq(("u", 10L, 2L, "view"), ("u", 10L, 1L, "click")).toDF("user", "ts", "eid", "etype")
    val out2 = funnel(ev2, Seq("user"), col("ts"), col("eid"),
      Seq("view" -> (col("etype") === "view"), "click" -> (col("etype") === "click")))
      .collect().head
    assert(Option(out2.get(2)).isEmpty)
  }

  test("saltedJoin == plain join on skewed data, for any salt width") {
    val rnd = new scala.util.Random(11)
    // 90% of fact rows hit one hot key
    val fact = (0 until 2000).map { i =>
      (if (rnd.nextDouble() < 0.9) 7L else rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "rid", "v")
    val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("k", "label")
    val plain = fact.join(dim, "k")
      .groupBy("label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (salt <- Seq(1, 4, 16)) {
      val salted = saltedJoin(fact, dim, "k", col("rid"), salt)
        .groupBy("label").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted == plain, s"salt=$salt")
    }
  }

  test("saltedJoin keeps inner-join semantics for keys missing on either side") {
    val fact = Seq((1L, 10L, 5L), (2L, 11L, 6L), (9L, 12L, 7L)).toDF("k", "rid", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "label")
    val out = saltedJoin(fact, dim, "k", col("rid"), 4)
      .select("k", "label", "v").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // key 9 (no dim row) and key 3 (no fact row) both drop, like a plain inner join
    assert(out == Set((1L, "a", 5L), (2L, "b", 6L)))
  }

  test("globalCumSum on an empty input returns empty, not an error") {
    val in = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(globalCumSum(in, Seq(col("k")), col("v"), "cum").count() == 0)
  }

  test("funnel with a single stage reduces to first-reach per key") {
    val ev = Seq(("u", 5L, 1L, "a"), ("u", 3L, 2L, "a"), ("v", 9L, 3L, "b")).toDF("user", "ts", "eid", "etype")
    val out = funnel(ev, Seq("user"), col("ts"), col("eid"), Seq("a" -> (col("etype") === "a")))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out == Map("u" -> Some(3L), "v" -> None))
  }

  test("funnel == sequential reference on random event streams (ScalaCheck)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val stages = Seq("a", "b", "c")
    // reference: single-pass scan in (ts, eid) order with the same
    // "stage i at-or-after first reach of stage i-1" rule
    def ref(events: Seq[(Long, Long, String)]): (Option[Long], Option[Long], Option[Long]) = {
      var ra, rb, rc = Option.empty[Long]
      events.sortBy(e => (e._1, e._2)).foreach { case (ts, _, st) =>
        if (st == "a" && ra.isEmpty) ra = Some(ts)
        if (st == "b" && rb.isEmpty && ra.nonEmpty) rb = Some(ts)
        if (st == "c" && rc.isEmpty && rb.nonEmpty) rc = Some(ts)
      }
      (ra, rb, rc)
    }
    val gen = for {
      n <- Gen.choose(1, 25)
      evs <- Gen.listOfN(n, for {
        ts <- Gen.choose(0L, 10L) // narrow range → frequent ties
        st <- Gen.oneOf(stages)
      } yield (ts, st))
    } yield evs.zipWithIndex.map { case ((ts, st), i) => (ts, i.toLong, st) }
    val prop = forAll(gen) { evs =>
      val df = evs.toDF("ts", "eid", "etype").withColumn("user", lit("u"))
      val row = funnel(df, Seq("user"), col("ts"), col("eid"),
        stages.map(s => s -> (col("etype") === s))).collect().head
      val got = (Option(row.get(1)).map(_.asInstanceOf[Long]),
        Option(row.get(2)).map(_.asInstanceOf[Long]),
        Option(row.get(3)).map(_.asInstanceOf[Long]))
      got == ref(evs)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(r.passed, r.status.toString)
  }

  test("globalCumSum handles duplicate order keys deterministically with a tiebreak") {
    val in = Seq((1L, 0L, 10L), (1L, 1L, 20L), (2L, 0L, 5L))
      .toDF("k", "tie", "v")
    val got = globalCumSum(in, Seq(col("k"), col("tie")), col("v"), "cum")
      .select("k", "tie", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 0L) -> 10L, (1L, 1L) -> 30L, (2L, 0L) -> 35L))
  }
}
