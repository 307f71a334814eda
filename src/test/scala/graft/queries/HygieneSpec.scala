package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wave-8 hygiene operators: arithmetic invariants that hold for ANY
  * input, checked on the driver testdata. */
class HygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q126 dispersion is non-negative and replays its formula") {
    val rows = HygieneQueries.q126_label_dispersion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, sv, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n * s - sv >= 0, "Cauchy-Schwarz: n*sum||x||^2 >= ||sum x||^2")
      assert(d == 1000L * (n * s - sv) / (n * n))
    }
  }

  test("q127 Borda gate keeps exactly the best half; ranks are permutations") {
    val df = HygieneQueries.q127_rank_ensemble(spark, sfDir).cache()
    try {
      val n = df.count()
      assert(df.filter(col("keep") === 1).count() == n / 2)
      Seq("fluency_rank", "cls_rank", "blend_rank").foreach { c =>
        val ranks = df.select(c).collect().map(_.getLong(0)).sorted
        assert(ranks.toSeq == (1L to n).toSeq, s"$c must be a permutation")
      }
      // keep is exactly the blend_rank <= n/2 predicate
      assert(df.filter((col("blend_rank") <= n / 2) =!= (col("keep") === 1)).count() == 0)
    } finally df.unpersist()
  }

  test("q129 median sits between min and max; zero-norm count bounded") {
    HygieneQueries.q129_vector_hygiene(spark, sfDir).collect().foreach { r =>
      val (n, nz, mn, md, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(mn <= md && md <= mx)
      assert(nz >= 0 && nz <= n)
      if (nz > 0) assert(mn == 0)
    }
  }

  test("q128 dominant share only flags docs with enough evidence") {
    HygieneQueries.q128_code_switch(spark, sfDir).collect().foreach { r =>
      val nHits = r.getLong(6)
      val dom = r.getLong(7)
      val mixed = r.getInt(8)
      assert(dom >= 0 && dom <= 10000)
      if (mixed == 1) {
        assert(nHits >= HygieneQueries.MixMinHits)
        assert(dom < HygieneQueries.MixDomX10k)
      }
      if (nHits > 0) {
        // the dominant language accounts for at least 1/5 of hits
        assert(dom >= 2000)
      }
    }
  }
}
