package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

/** Contracts of the round-3 pipeline operators: deterministic sharding,
  * binned range join ≡ naive inequality join, int8 quantization bounds,
  * and the HLL sketch's accuracy + partial-merge algebra. */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  test("deterministicShuffle: reproducible order, dense 1..N positions, shards in range") {
    val ids = (1L to 200L).toDF("doc_id")
    def run() = Sharding.deterministicShuffle(ids, col("doc_id"), "s1", 8)
      .select("doc_id", "shard", "global_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val a = run()
    assert(a.sameElements(run()), "same seed must reproduce the same order")
    assert(a.map(_._3).sorted.sameElements(1L to 200L), "positions must be dense 1..N")
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // a different seed produces a genuinely different permutation
    val b = Sharding.deterministicShuffle(ids, col("doc_id"), "s2", 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(!a.map(_._3).sameElements(b.map(_._2)))
    // shards are roughly uniform (200 over 8 → expect 25, allow wide slack)
    val perShard = a.groupBy(_._2).view.mapValues(_.length)
    assert(perShard.values.forall(n => n > 5 && n < 60), perShard.toMap.toString)
  }

  test("binnedRangeJoin == naive inequality join on random event data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 150).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "lts", "lid")
    val right = (1 to 400).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rts", "rid")
    val window = 100L
    val got = Relational.binnedRangeJoin(left, right, "k", "lts", "rts", window)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.as("l").join(right.as("r"),
      col("l.k") === col("r.k") && col("rts") >= col("lts") &&
        col("rts") < col("lts") + lit(window))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("binnedRangeJoin plans a hash-partitionable equi-join, not a nested loop") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "lts", "lid")
    val right = Seq((1L, 15L, 2L)).toDF("k", "rts", "rid")
    val plan = Relational.binnedRangeJoin(left, right, "k", "lts", "rts", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("int8Quantize: extremes hit ±127, zero vector maps to zeros, all within range") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-0.25f, 0.125f, 0.0625f, -1.0f))
    ).toDF("id", "v")
      .select(col("id"), VectorFunctions.quantize(col("v")).as("vq"))
      .withColumn("scale", VectorFunctions.qmaxAbs(col("vq")))
      .withColumn("q8", VectorFunctions.int8Quantize(col("vq"), col("scale")))
      .select("id", "q8").as[(Long, Seq[Long])].collect().toMap
    assert(df(1L) == Seq(127L, -127L, 63L, 0L))
    assert(df(2L) == Seq(0L, 0L, 0L, 0L))
    assert(df(3L).forall(q => q >= -127L && q <= 127L))
    assert(df(3L).last == -127L)
  }

  test("fused Int8QuantizeVec ≡ the HOF composition (scale and q8, real vectors)") {
    graft.expressions.GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val hof = emb
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("vq"))
      .withColumn("qscale", VectorFunctions.qmaxAbs(col("vq")))
      .withColumn("q8", VectorFunctions.int8Quantize(col("vq"), col("qscale")))
      .select("vec_id", "qscale", "q8")
    val fused = emb
      .select(col("vec_id"),
        call_function(graft.expressions.GraftFunctions.Int8QuantizeName,
          col("embedding")).as("f"))
      .select(col("vec_id"), col("f.qscale").as("qscale"), col("f.q8").as("q8"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty)
  }

  test("fused Int8QuantizeVec ≡ HOF on null elements, including the qscale==0 edge") {
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq(Some(1.0f), None, Some(0.5f))), // null slot, qscale > 0 → stays null
      (2L, Seq[Option[Float]](None, None, None)), // all-null vector → qscale == 0
      (3L, Seq(Some(0.0f), None, Some(0.0f))) // zeros + null → qscale == 0
    ).toDF("id", "v")
    val hof = df
      .select(col("id"), VectorFunctions.quantize(col("v")).as("vq"))
      .withColumn("qscale", VectorFunctions.qmaxAbs(col("vq")))
      .withColumn("q8", VectorFunctions.int8Quantize(col("vq"), col("qscale")))
      .select("id", "qscale", "q8")
    val fused = df
      .select(col("id"),
        call_function(graft.expressions.GraftFunctions.Int8QuantizeName,
          col("v")).as("f"))
      .select(col("id"), col("f.qscale").as("qscale"), col("f.q8").as("q8"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty,
      s"hof=${hof.collect().toSeq} fused=${fused.collect().toSeq}")
    // pin the edge explicitly: zero-scale vectors map null slots to 0 (the
    // HOF's otherwise(0L) is per-element unconditional in that branch)
    val q8 = fused.filter(col("id") === 2L)
      .select("q8").as[Seq[Option[Long]]].head()
    assert(q8 == Seq(Some(0L), Some(0L), Some(0L)), s"got $q8")
  }

  test("HLL sketch estimate within 5% of exact; partial sketches merge to the global") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val exact = events.agg(countDistinct("user_id")).as[Long].head()
    val approx = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id")))).as[Long].head()
    assert(math.abs(approx - exact) <= math.max(1L, (0.05 * exact).toLong),
      s"approx=$approx exact=$exact")
    // mergeability: per-type partial sketches union to the same estimate a
    // single global sketch gives — the algebra that lets the shuffle carry
    // sketches instead of raw ids
    val merged = events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).as[Long].head()
    assert(merged == approx, s"merged=$merged single=$approx")
  }
}
