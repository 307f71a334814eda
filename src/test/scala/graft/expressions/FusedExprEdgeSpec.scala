package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case pins for the round-9 fused expressions, at the boundaries
  * the oracle gate's corpus data never exercises: empty arrays, null
  * elements, below-gram-size inputs, multi-byte code points. */
class FusedExprEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftFunctions.register(spark); spark }

  test("WinnowFps: empty tokens / below-n tokens emit no fingerprints; null token skipped like concat_ws") {
    registered()
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a", "b")), // < n=3 tokens: no gram
      (3L, Seq("a", "b", "c")), // exactly one gram
      (4L, Seq("a", null, "b", "c")) // null inside a gram
    ).toDF("id", "t")
    val fps = df.select(col("id"), call_function(
      GraftFunctions.WinnowFpsName, col("t"), lit(3), lit(4)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).isEmpty && fps(2L).isEmpty)
    assert(fps(3L).size == 1)
    // null-skipping: gram over (a, null, b) hashes "a b" — same as the
    // SQL md5(concat_ws(' ', ...)) reference would
    assert(fps(4L).nonEmpty)
    // and the single-gram doc's fingerprint equals the reference hash:
    // conv(substring(md5('a b c'), 1, 8), 16, 10)
    val ref = spark.sql("SELECT CAST(conv(substring(md5('a b c'), 1, 8), 16, 10) AS BIGINT)")
      .collect()(0).getLong(0)
    assert(fps(3L).head == ref)
  }

  test("SortedPairs: 0/1-element lists yield no pairs; order is (i,j) lexicographic") {
    registered()
    val df = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(7L)),
      (3L, Seq(1L, 2L, 3L))
    ).toDF("id", "xs")
    val pairs = df.select(col("id"), call_function(
      GraftFunctions.SortedPairsName, col("xs")).as("ps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(pairs(1L).isEmpty && pairs(2L).isEmpty)
    assert(pairs(3L).map(p => (p.getLong(0), p.getLong(1))) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("CdcChunks: empty token array emits no chunks; every token lands in exactly one chunk") {
    registered()
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, (1 to 100).map(i => s"w$i"))
    ).toDF("id", "t")
    val rows = df.select(col("id"), explode_outer(call_function(
      GraftFunctions.CdcChunksName, col("t"), lit(8))).as("c")).collect()
    assert(rows.count(r => r.getLong(0) == 1L && !r.isNullAt(1)) == 0)
    val lens = rows.filter(r => r.getLong(0) == 2L)
      .map(_.getStruct(1)).map(_.getLong(2))
    assert(lens.sum == 100L, "chunk lengths must partition the token stream")
  }

  test("CharGramCounts: totals equal CharGrams occurrence counts; first-occurrence order; " +
      "multi-byte and below-n inputs") {
    registered()
    val df = Seq("abcabcab", "héllo héllo", "ab", "").toDF("s")
    // A/B: summed per-gram counts == explode-and-count over CharGrams
    val got = df.select(col("s"), explode(call_function(
        GraftFunctions.CharGramCountsName, col("s"), lit(3))).as("e"))
      .groupBy("s", "e.g").agg(sum("e.c").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ref = df.select(col("s"), explode(call_function(
        GraftFunctions.CharGramsName, col("s"), lit(3))).as("g"))
      .groupBy("s", "g").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == ref, "CharGramCounts totals diverge from CharGrams occurrence counts")
    // first-occurrence order and in-row totals on a repeating string
    val rows = df.filter(col("s") === "abcabcab")
      .select(call_function(GraftFunctions.CharGramCountsName, col("s"), lit(3)).as("e"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(_.getString(0)) == Seq("abc", "bca", "cab"))
    assert(rows.map(_.getLong(1)) == Seq(2L, 2L, 2L))
    // below-n and empty: empty array
    val empties = df.filter(length(col("s")) < 3)
      .select(call_function(GraftFunctions.CharGramCountsName, col("s"), lit(3)).as("e"))
      .collect().map(_.getSeq[Any](0))
    assert(empties.forall(_.isEmpty))
  }

  test("CharGramCodes: 21-bit pack is a bijection onto CharGramCounts — decoded " +
      "(gram, count) sets match on multi-byte, repeating, below-n and empty inputs") {
    registered()
    val df = Seq("abcabcab", "héllo héllo wörld", "日本語のテキスト日本語", "ab", "")
      .toDF("s")
    // decode each packed code back to its 3 code points and compare with
    // the string-keyed counts (order-insensitive: codes sort numerically,
    // strings by first occurrence)
    val got = df.select(col("s"), explode(call_function(
        GraftFunctions.CharGramCodesName, col("s"), lit(3))).as("e"))
      .collect().map { r =>
        val code = r.getStruct(1).getLong(0)
        val gram = new String(Array(
          ((code >> 42) & 0x1FFFFF).toInt,
          ((code >> 21) & 0x1FFFFF).toInt,
          (code & 0x1FFFFF).toInt), 0, 3)
        (r.getString(0), gram) -> r.getStruct(1).getLong(1)
      }.toMap
    val ref = df.select(col("s"), explode(call_function(
        GraftFunctions.CharGramCountsName, col("s"), lit(3))).as("e"))
      .collect().map(r =>
        (r.getString(0), r.getStruct(1).getString(0)) -> r.getStruct(1).getLong(1))
      .toMap
    assert(got == ref, "packed gram counts diverge from string-keyed gram counts")
    // below-n and empty yield empty arrays
    val empties = df.filter(length(col("s")) < 3)
      .select(call_function(GraftFunctions.CharGramCodesName, col("s"), lit(3)).as("e"))
      .collect().map(_.getSeq[Any](0))
    assert(empties.forall(_.isEmpty))
  }

  test("CharGrams: code-point indexing matches SQL substring on multi-byte text") {
    registered()
    val df = Seq("héllo wörld", "ab", "").toDF("s")
    val got = df.select(call_function(
      GraftFunctions.CharGramsName, col("s"), lit(3)).as("g"))
      .collect().map(_.getSeq[String](0))
    val ref = df.select(expr(
      "CASE WHEN length(s) < 3 THEN CAST(array() AS array<string>) " +
        "ELSE transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)) END").as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq == ref.toSeq, "CharGrams diverges from SQL substring semantics")
  }
}
