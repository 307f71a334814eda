package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantics pins for the round-4 training-prep operators: BPE greedy
  * merge algebra (incl. the same-symbol run edge), SemDeDup planted
  * duplicates, k-center coverage + radius monotonicity, classifier
  * additivity. The exact-value oracle check is the driver's gate; these
  * pin hand-computable cases. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ BPE

  test("BPE: weighted pair counts pick the right merges (hand-computed)") {
    // round 1 pair counts: (a,b) = 2·2 + 1 = 5, (b,a) = 2, (a,a) = 1
    // round 2 (after ab merges): (ab,ab) = 2, (a,ab) = 1
    val vocab = Seq(("abab", 2L), ("aab", 1L)).toDF("word", "n")
    val merges = Bpe.trainMerges(vocab, rounds = 2).orderBy("merge_round").collect()
    assert(merges.toSeq == Seq(
      Row(1, "a", "b", "ab", 5L),
      Row(2, "ab", "ab", "abab", 2L)))
    val segs = Bpe.segmentations(vocab, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("abab") == Seq("abab"))
    assert(segs("aab") == Seq("a", "ab"))
  }

  test("BPE: same-symbol runs merge greedily left-to-right (aaaa -> aa aa)") {
    val vocab = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "n")
    // pairs: (a,a) appears 3 + 2 = 5 times
    val merges = Bpe.trainMerges(vocab, rounds = 1).collect()
    assert(merges.toSeq == Seq(Row(1, "a", "a", "aa", 5L)))
    val segs = Bpe.segmentations(vocab, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("aaaa") == Seq("aa", "aa")) // greedy: positions 0 and 2
    assert(segs("aaa") == Seq("aa", "a")) // odd tail stays single
  }

  test("BPE: repeated multi-char symbol runs replay the oracle's grp algebra") {
    // Round 3 merges (abc,abc) over seg abc|abc|abc (positions 0,3,6 — a
    // POSITION-GAPPED f-run after two merge rounds). The oracle's
    // grp = pos − rank(f=1) rule puts each gapped occurrence in its OWN
    // group, so both pos 0 and pos 3 start merges and the prev_s cascade
    // drops the tail row: segmentation ["abcabc"]. A run-parity rule
    // keyed on lag(f) alone (round 11's first form) would instead emit
    // ["abcabc", "abc"] and diverge from the DuckDB replay (ADVICE r11);
    // this pins the position-gap run break in mergeRound.
    val vocab = Seq(("abcabcabc", 1L)).toDF("word", "n")
    val merges = Bpe.trainMerges(vocab, rounds = 3).orderBy("merge_round").collect()
    assert(merges.toSeq == Seq(
      Row(1, "a", "b", "ab", 3L),
      Row(2, "ab", "c", "abc", 3L),
      Row(3, "abc", "abc", "abcabc", 2L)))
    val segs = Bpe.segmentations(vocab, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("abcabcabc") == Seq("abcabc"))
  }

  test("BPE: exhausted merges leave segmentations unchanged (no empty-winner wipe)") {
    // one 2-char word: round 1 merges it fully; rounds 2-3 find no pairs
    val vocab = Seq(("ab", 1L)).toDF("word", "n")
    val merges = Bpe.trainMerges(vocab, rounds = 3).collect()
    assert(merges.toSeq == Seq(Row(1, "a", "b", "ab", 1L)))
    val segs = Bpe.segmentations(vocab, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("ab") == Seq("ab"))
  }

  // ----------------------------------------------------------- delta dedup

  test("delta screen: arriving near-dups flag against the standing corpus") {
    import org.apache.spark.sql.functions.col
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, base), (1L, "a completely different standing document full of words"),
      (2L, "yet another unrelated corpus document with its own content"),
      (100L, base), // arriving exact copy of doc 0 -> matches corpus
      (101L, "fresh novel arriving text sharing nothing with anything else")
    ).toDF("doc_id", "text")
    val out = Dedup.deltaNearDupScreen(docs, col("doc_id") >= 100L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(100L, 101L)) // verdicts ONLY for the batch
    assert(out(100L).getAs[Int]("novel") == 0)
    assert(out(100L).getAs[Long]("dup_of") == 0L)
    assert(out(101L).getAs[Int]("novel") == 1)
    assert(out(101L).getAs[Long]("dup_of") == -1L)
  }

  // ------------------------------------------------------------- SemDeDup

  // unit-scale directions: the integer cosine test's BIGINT headroom is
  // sized for unit-norm embeddings (quantized elements ~1e3), like the
  // corpus embedding table
  private def vec(dir: Int, scale: Float, dim: Int = 8): Array[Float] =
    Array.tabulate(dim)(i => if (i == dir) scale else 0.001f * ((i + dir) % 3))

  test("SemDeDup: planted duplicates drop against their lowest-id twin") {
    val rows = Seq(
      (0L, vec(0, 1f)), (1L, vec(1, 1f)), (2L, vec(2, 1f)), (3L, vec(3, 1f)),
      (4L, vec(0, 1f)), // exact copy of 0 -> dropped, dup_of = 0
      (5L, vec(1, 1f)), // exact copy of 1 -> dropped, dup_of = 1
      // float-level near-copy of 0 (identical after quantization, so it
      // provably co-clusters; a 1.001f variant can seed its own cluster
      // in a 7-vector corpus — the boundary-miss trade SemDeDup accepts)
      (6L, vec(0, 1.0004f))
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semDeDup(rows, k = 4, iters = 2, minCosX100 = 95L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(4).getAs[Int]("kept") == 0 && out(4).getAs[Long]("dup_of") == 0L)
    assert(out(5).getAs[Int]("kept") == 0 && out(5).getAs[Long]("dup_of") == 1L)
    assert(out(6).getAs[Int]("kept") == 0 && out(6).getAs[Long]("dup_of") == 0L)
    // the four originals survive (nothing with a lower id is close to them)
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Int]("kept") == 1, s"vec $id should be kept")
      assert(out(id).getAs[Long]("dup_of") == -1L)
    }
  }

  test("SemDeDup: identical vectors always share a cluster (verdict is stable)") {
    // duplicates can never be split across clusters: assignment is a
    // function of the vector, so the pair is always compared
    val rows = (0L until 20L).map(i => (i, vec((i % 5).toInt, 1f))).toDF("vec_id", "embedding")
    val out = SemDedup.semDeDup(rows, k = 3, iters = 2, minCosX100 = 95L).collect()
    // every id >= 5 duplicates id % 5 -> dropped with dup_of = id % 5
    out.filter(_.getLong(0) >= 5L).foreach { r =>
      assert(r.getAs[Int]("kept") == 0, s"${r.getLong(0)} should drop")
      assert(r.getAs[Long]("dup_of") == r.getLong(0) % 5)
    }
  }

  // ------------------------------------------------------------- k-center

  test("k-center: covers every well-separated group; radius non-increasing") {
    // 3 tight groups of 4 around axes 0/1/2; k=3 must pick one per group
    val rows = (0 until 12).map { i =>
      val g = i / 4
      (i.toLong, Array.tabulate(8)(d => (if (d == g) 100f else 0f) + 0.1f * (i % 4)))
    }.toDF("vec_id", "embedding")
    val sel = Coreset.kCenters(rows, k = 3).orderBy("sel_round").collect()
    assert(sel.length == 3)
    val groups = sel.map(_.getLong(1) / 4).toSet
    assert(groups == Set(0L, 1L, 2L), s"one center per group, got $groups")
    assert(sel(0).getLong(2) == 0L) // seed radius is 0 by definition
    val radii = sel.drop(1).map(_.getLong(2))
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      s"radius curve must be non-increasing: ${radii.toSeq}")
  }

  test("k-center: sampleCap restricts selection to the hash-spread sample") {
    val rows = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i / 4) 100f else 0.5f * i))
    }.toDF("vec_id", "embedding")
    val capped = Coreset.kCenters(rows, k = 2, sampleCap = 6).orderBy("sel_round").collect()
    val full = Coreset.kCenters(rows, k = 2, sampleCap = 100).orderBy("sel_round").collect()
    assert(capped.length == 2)
    // a cap >= corpus size is exactly the uncapped selection
    val uncapped = Coreset.kCenters(rows, k = 2).orderBy("sel_round").collect()
    assert(full.map(_.toSeq).toSeq == uncapped.map(_.toSeq).toSeq)
  }

  // ------------------------------------------------- classifier additivity

  test("quality classifier: single-token scores are ±1 and compose additively") {
    val docsDir = java.nio.file.Files.createTempDirectory("tpq").toString
    Seq(
      (0L, "foo", "en", "s", 3L),
      (1L, "bar", "en", "s", 3L),
      (2L, "foo bar", "en", "s", 7L),
      (3L, "", "en", "s", 0L) // empty doc: zero tokens, keep by convention
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val out = graft.queries.TrainPrepQueries.q97_quality_classifier(spark, docsDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val s0 = out(0L).getAs[Long]("score")
    val s1 = out(1L).getAs[Long]("score")
    assert(math.abs(s0) == 1L && math.abs(s1) == 1L)
    assert(out(2L).getAs[Long]("score") == s0 + s1)
    assert(out(2L).getAs[Long]("n_tokens") == 2L)
    assert(out(3L).getAs[Long]("n_tokens") == 0L)
    assert(out(3L).getAs[Int]("keep_doc") == 1)
  }

  // ------------------------------------------------------- LM familiarity

  test("LM familiarity: hand-computed trigram means") {
    val docsDir = java.nio.file.Files.createTempDirectory("tpf").toString
    Seq(
      // trigrams: "a b c"x3, "b c a"x2, "c a b"x2
      (0L, "a b c a b c a b c", "en", "s", 17L),
      (1L, "x y z", "en", "s", 5L), // one unseen-elsewhere trigram
      (2L, "a b", "en", "s", 3L) // too short: no trigrams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val out = graft.queries.TrainPrepQueries.q96_lm_familiarity(spark, docsDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 0: fam = 3*3 + 2*2 + 2*2 = 17 over 7 trigrams -> 2428
    assert(out(0L).getAs[Long]("n_tris") == 7L)
    assert(out(0L).getAs[Long]("fam_sum") == 17L)
    assert(out(0L).getAs[Long]("mean_x1k") == 2428L)
    assert(out(0L).getAs[Int]("familiar") == 1)
    assert(out(1L).getAs[Long]("mean_x1k") == 1000L)
    assert(out(1L).getAs[Int]("familiar") == 0)
    assert(out(2L).getAs[Long]("n_tris") == 0L)
    assert(out(2L).getAs[Long]("mean_x1k") == 0L)
  }

  // ------------------------------------------------------ span corruption

  test("span corruption: Spark plan matches an independent JVM brute force") {
    import graft.queries.TrainPrepQueries.{ScSeed, ScStartMax, spanMaskPlan}
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // pre-normalized texts (lowercase, single-spaced) so tokens = split
    val texts = (0L until 24L).map { id =>
      id -> (0 until (5 + (id % 7).toInt * 6)).map(i => s"w${(i * 7 + id) % 13}")
        .mkString(" ")
    }
    val df = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = spanMaskPlan(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      val nt = t.split(" ").length
      val covered = scala.collection.mutable.SortedSet[Int]()
      var spans = 0
      (0 until nt).foreach { pos =>
        val h = md5hex(s"$ScSeed:$id:$pos")
        if (java.lang.Long.parseLong(h.substring(0, 2), 16) < ScStartMax) {
          val sl = 1 + (java.lang.Long.parseLong(h.substring(2, 3), 16) % 3).toInt
          covered ++= (pos until math.min(pos + sl, nt))
        }
      }
      spans = covered.count(p => !covered.contains(p - 1))
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") == nt.toLong, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_masked") == covered.size.toLong, s"doc $id masked")
      assert(r.getAs[Long]("n_spans") == spans.toLong, s"doc $id spans")
      assert(r.getAs[Long]("mask_x1k") ==
        (if (nt == 0) 0L else 1000L * covered.size / nt), s"doc $id ratio")
    }
    // the plan actually masks something and merges at least one overlap
    assert(got.values.map(_.getAs[Long]("n_masked")).sum > 0)
  }

  // -------------------------------------------------------- delta novelty

  test("delta novelty: copied arriving text scores 0, unique text 1000") {
    import graft.queries.TrainPrepQueries.{DeltaSeed, DeltaBucketMax}
    val md = java.security.MessageDigest.getInstance("MD5")
    def arrives(id: Long): Boolean = {
      val h = md.digest(s"$DeltaSeed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 2), 16) < DeltaBucketMax
    }
    // pick real split members so the test follows the q99 arriving hash
    val arriving = (0L to 80L).filter(arrives)
    val standing = (0L to 80L).filterNot(arrives)
    assert(arriving.size >= 2 && standing.size >= 1)
    val shared = (1 to 10).map(i => s"c$i").mkString(" ") // 10 toks = 3 8-grams
    val uniq = (1 to 10).map(i => s"u$i").mkString(" ")
    val rows = Seq(
      (standing.head, shared, "en", "s", 1L), // standing owner of the grams
      (arriving(0), shared, "en", "s", 1L),   // arriving copy: nothing novel
      (arriving(1), uniq, "en", "s", 1L))     // arriving unique: all novel
    val dir = java.nio.file.Files.createTempDirectory("tnov").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TrainPrepQueries.q109_delta_novelty(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(arriving(0), arriving(1)))
    assert(out(arriving(0)).getAs[Long]("n_grams") == 3L)
    assert(out(arriving(0)).getAs[Long]("n_novel") == 0L)
    assert(out(arriving(0)).getAs[Long]("novel_x1k") == 0L)
    assert(out(arriving(1)).getAs[Long]("n_grams") == 3L)
    assert(out(arriving(1)).getAs[Long]("novel_x1k") == 1000L)
  }

  // --------------------------------------------------------- hard examples

  test("hard examples: top-5 smallest margins per source match a brute force") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = graft.queries.TrainPrepQueries
      .q97_quality_classifier(spark, dir).collect()
      .filter(_.getAs[Long]("n_tokens") > 0)
      .map(r => (r.getLong(0), math.abs(r.getAs[Long]("score"))))
    val expected = scores.groupBy { case (id, _) => docs(id) }
      .flatMap { case (src, xs) =>
        xs.toSeq.sortBy { case (id, m) => (m, id) }.take(5).zipWithIndex
          .map { case ((id, m), i) => (src, i + 1L, id, m) }
      }.toSet
    val got = graft.queries.TrainPrepQueries.q110_hard_examples(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("margin"))).toSet
    assert(got == expected)
  }
}
