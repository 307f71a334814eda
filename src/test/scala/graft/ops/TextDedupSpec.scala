package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.ops.Dedup

/** Unit tests for text-analysis functions and the dedup operator family on
  * hand-built corpora with planted duplicates (reference-free: these are
  * the training-data-pipeline extensions, builder prompt). */
class TextDedupSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("token counts: whitespace and BPE-ish") {
    val df = docs(
      1L -> "the cat sat",
      2L -> "",
      3L -> "  spaced   out  ",
      4L -> "ab3 c-d!")
      .select(col("doc_id"), tokenCountWs(col("text")).as("ws"),
        tokenCountBpe(col("text")).as("bpe"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(df(1L) == (3, 3))
    assert(df(2L) == (0, 0))
    assert(df(3L) == (2, 2))
    // ab / 3 / c / - / d / !  → 6 BPE-ish tokens, 2 ws tokens
    assert(df(4L) == (2, 6))
  }

  test("charChunks: short doc → 1 chunk; boundaries overlap by size-stride; full coverage") {
    // size 10, stride 7: len 10 → 1 chunk; len 11 → 2; len 24 → 3
    val out = docs(
      1L -> "a" * 10,
      2L -> "b" * 11,
      3L -> ("0123456789" + "ABCDEFGHIJ" + "wxyz"))
      .select(col("doc_id"), explode(charChunks(col("text"), 10, 7)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_start"), col("c.chunk_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(out.keys.count(_._1 == 1L) == 1)
    assert(out.keys.count(_._1 == 2L) == 2)
    assert(out((2L, 1L)) == (7L, "b" * 4)) // tail chunk short
    assert(out.keys.count(_._1 == 3L) == 3)
    assert(out((3L, 0L)) == (0L, "0123456789"))
    assert(out((3L, 1L)) == (7L, "789ABCDEFG")) // 3-char overlap with chunk 0
    assert(out((3L, 2L)) == (14L, "EFGHIJwxyz"))
  }

  test("charChunks with stride == size tiles without overlap and covers every char") {
    val out = docs(1L -> ("x" * 25))
      .select(explode(charChunks(col("text"), 10, 10)).as("c"))
      .select(col("c.chunk_start"), col("c.chunk_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 10L, 20L))
    assert(out.map(_._2.length).sum == 25)
  }

  test("language id picks the stopword-richest language, und when none hit") {
    val df = docs(
      1L -> "the cat and the dog of it",
      2L -> "il gatto e il cane che non sono con",
      3L -> "zzz qqq xxx")
      .select(col("doc_id"), langId(col("text")).as("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(df == Map(1L -> "en", 2L -> "it", 3L -> "und"))
  }

  test("normalization + fingerprint: punctuation/case/whitespace-insensitive") {
    val fps = docs(1L -> "Hello,   World!", 2L -> "hello world", 3L -> "other text")
      .select(col("doc_id"), fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("exact dedup groups identical normalized texts, keep-first canonical") {
    val out = Dedup.exact(docs(1L -> "A b", 2L -> "a   B!", 3L -> "c"))
      .select("doc_id", "canonical_id", "is_dup", "group_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(out == Set((1L, 1L, 0, 2L), (2L, 1L, 1, 2L), (3L, 3L, 0, 1L)))
  }

  test("word shingles") {
    val sh = docs(1L -> "a b c d", 2L -> "a b")
      .select(col("doc_id"), wordShingles(col("text"), 3).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) == Set("a b c", "b c d"))
    assert(sh(2L) == Set.empty[String])
  }

  test("jaccard pairs find planted near-duplicates and nothing else") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " DIFFERENT"
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val pairs = Dedup.jaccardPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), n = 3, minJaccardX10k = 5000L)
      .select("id_a", "id_b", "jaccard_x10k").collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getLong(2) > 8000L)
  }

  test("minhash LSH recovers high-jaccard pairs") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " X"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val pairs = Dedup.minhashLshPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), n = 3, bands = 4, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs distance 0, near-dups close, distinct docs far") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 48).map(i => s"w$i").mkString(" ") + " x y"
    val other = (100 to 150).map(i => s"v$i").mkString(" ")
    val sig = Dedup.simhash64(docs(1L -> base, 2L -> base, 3L -> nearDup, 4L -> other))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // 64-bit scale: unrelated docs sit near E[ham]=32; near-dups (2 of 50
    // tokens changed) flip only the bits whose majority vote was marginal
    assert(ham(sig(1L), sig(2L)) == 0)
    assert(ham(sig(1L), sig(3L)) <= 14, s"near-dup distance ${ham(sig(1L), sig(3L))}")
    assert(ham(sig(1L), sig(4L)) > 20, s"unrelated distance ${ham(sig(1L), sig(4L))}")
  }

  test("jaccard pairs == brute-force reference on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val word = Gen.choose(0, 20).map(i => s"w$i")
    val doc = Gen.choose(5, 25).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(3, 10).flatMap(n => Gen.listOfN(n, doc))
    def refShingles(t: String, n: Int): Set[String] = {
      val w = t.split("\\s+").toSeq
      (0 to w.size - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
    }
    val prop = forAll(corpus) { texts =>
      val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      val got = Dedup.jaccardPairs(d, n = 2, minJaccardX10k = 2000L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
      val expected = (for {
        a <- texts.indices; b <- texts.indices if a < b
        sa = refShingles(texts(a), 2); sb = refShingles(texts(b), 2)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size if inter > 0
        j = 10000L * inter / (sa.size + sb.size - inter) if j >= 2000L
      } yield (a.toLong, b.toLong) -> j).toMap
      got == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("simhash pairs == ground-truth hamming<=3 pairs (pigeonhole completeness)") {
    val corpus = (1L to 40L).map { i =>
      // overlapping word ranges → a spectrum of signature distances
      i -> (i to i + 30).map(j => s"w$j").mkString(" ")
    }
    val d = docs(corpus: _*)
    val sig = Dedup.simhash64(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(d, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "corpus should contain some close signatures")
  }
}
