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

  test("globalCumSum handles duplicate order keys deterministically with a tiebreak") {
    val in = Seq((1L, 0L, 10L), (1L, 1L, 20L), (2L, 0L, 5L))
      .toDF("k", "tie", "v")
    val got = globalCumSum(in, Seq(col("k"), col("tie")), col("v"), "cum")
      .select("k", "tie", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 0L) -> 10L, (1L, 1L) -> 30L, (2L, 0L) -> 35L))
  }
}
