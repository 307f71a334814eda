package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 wave specs: the winnowing POSITIONAL guarantee (the property
  * that distinguishes X232 from MinHash), removal-effect attribution
  * semantics on planted journeys (X238), and a tiling boundary case
  * (X233). The oracle gate covers value-level parity; these pin the
  * guarantees the oracle can't express. */
class WaveThirtySpec extends SparkSpec {
  import spark.implicits._

  test("winnowing: any shared token run of length >= w+n-1 yields a shared fingerprint") {
    val minRun = TextOpsQueries.WinnowW + TextOpsQueries.WinnowN - 1 // 6
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def noise(tag: String, n: Int): Seq[String] =
        Seq.fill(n)(s"$tag${rnd.nextInt(40)}")
      val run = (0 until minRun + rnd.nextInt(3)).map(i => s"run${seed}x$i")
      val docA = (noise("a", rnd.nextInt(30)) ++ run ++ noise("a", rnd.nextInt(30))).mkString(" ")
      val docB = (noise("b", rnd.nextInt(30)) ++ run ++ noise("b", rnd.nextInt(30))).mkString(" ")
      val fps = TextOpsQueries.winnowFingerprints(
        Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"))
      val shared = fps.filter(col("doc_id") === 1L).select("h")
        .intersect(fps.filter(col("doc_id") === 2L).select("h"))
        .count()
      assert(shared >= 1, s"seed=$seed: planted run of ${run.size} tokens shared no fingerprint")
    }
  }

  test("winnowing: every doc with >= 1 gram is fingerprinted; selection is deterministic") {
    val docs = Seq(
      (1L, "one two three"),                       // exactly 1 gram, < w: global-min branch
      (2L, "a b c d e f g h i j k l m n o p q r"), // many full windows
      (3L, "x y")                                  // no gram at all
    ).toDF("doc_id", "text")
    val fps = TextOpsQueries.winnowFingerprints(docs)
    val byDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) == 1L, "single-gram doc keeps its only gram")
    assert(byDoc.getOrElse(3L, 0L) == 0L, "doc below the gram size has no fingerprints")
    assert(byDoc(2L) >= 1L && byDoc(2L) <= 16L)
    // determinism: a second run selects the identical set
    val again = TextOpsQueries.winnowFingerprints(docs)
    assert(fps.except(again).count() == 0 && again.except(fps).count() == 0)
  }

  test("winnowing: fused WinnowFps expression == composed SQL reference, bit-identical") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      // lengths straddle every branch: no gram, 1 gram, < w windows, many
      val len = rnd.nextInt(30)
      (id, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val fused = TextOpsQueries.winnowFingerprints(docs)
    val ref = TextOpsQueries.winnowFingerprintsReference(docs)
    assert(fused.except(ref).count() == 0 && ref.except(fused).count() == 0,
      "fused winnow fingerprints diverge from the composed SQL form")
  }

  test("removal effect: gating channel scores 10000, irrelevant channel 0, partial path pro-rata") {
    // u1: view -> click -> purchase ; u2: view -> error (no conversion) ;
    // u3: click -> purchase. 'click' gates EVERY conversion; 'error' sits
    // only on a dead branch; 'view' carries 1 of 2 converting starts.
    val ev = Seq(
      (1L, 1000L, 1L, "view"), (1L, 2000L, 2L, "click"), (1L, 3000L, 3L, "purchase"),
      (2L, 1000L, 4L, "view"), (2L, 2000L, 5L, "error"),
      (3L, 1000L, 6L, "click"), (3L, 2000L, 7L, "purchase")
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = ValueQueries.removalEffects(spark, ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // full conversion: START->(view 2/3, click 1/3); view->(click 1/2);
    // click->CONV -> 2/3*1/2 + 1/3 = 2/3 with per-step integer floors
    assert(got("click") == ((666666L, 0L, 10000L)), s"click: ${got("click")}")
    assert(got("error") == ((666666L, 666666L, 0L)), s"error: ${got("error")}")
    assert(got("view") == ((666666L, 333333L, 5000L)), s"view: ${got("view")}")
    // signup never occurs: removing it changes nothing
    assert(got("signup") == ((666666L, 666666L, 0L)), s"signup: ${got("signup")}")
  }

  test("removal effect: purchase-first journeys and post-conversion events are handled") {
    // u1 converts immediately (START->CONV, no channel involved); the
    // post-conversion click must NOT enter the matrix
    val ev = Seq(
      (1L, 1000L, 1L, "purchase"), (1L, 2000L, 2L, "click"),
      (2L, 1000L, 3L, "view")
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = ValueQueries.removalEffects(spark, ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // full: START->(CONV 1/2, view 1/2) -> 500000; no channel affects it
    ValueQueries.RemovalChannels.foreach { ch =>
      assert(got(ch) == ((500000L, 0L)), s"$ch: ${got(ch)}")
    }
  }

  test("tiling: disjoint-vocabulary halves create a boundary; uniform text does not") {
    val block = TextOpsQueries.TileBlock
    val twoTopic = ((0 until block).map(i => s"alpha$i") ++
      (0 until block).map(i => s"beta$i")).mkString(" ")
    val uniform = Seq.fill(2 * block)("same word pair").mkString(" ")
    // the adjacency math is value-pinned through the oracle; here assert
    // the BOUNDARY semantics on a hand-built frame through the same plan
    val tk = Seq((1L, twoTopic), (2L, uniform)).toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.wsTokens(
        graft.functions.TextFunctions.normalizeText(col("text")))).as(Seq("p0", "token")))
      .select(col("doc_id"), expr(s"CAST(p0 div $block AS BIGINT)").as("block"), col("token"))
    val vocab = tk.distinct()
    val sizes = vocab.groupBy("doc_id", "block").agg(count(lit(1)).as("sz"))
    val inter = vocab.as("x").join(vocab.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.token") === col("y.token") &&
          col("y.block") === col("x.block") + 1L)
      .groupBy(col("x.doc_id").as("doc_id")).agg(count(lit(1)).as("n_common"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inter.getOrElse(1L, 0L) == 0L, "disjoint halves share no vocabulary")
    assert(inter(2L) >= 1L, "uniform text keeps adjacent blocks similar")
    assert(sizes.filter(col("doc_id") === 1L).count() == 2)
  }
}
