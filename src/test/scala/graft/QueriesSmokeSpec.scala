package graft

/** Every registered query must run at sf0.001 and produce a stable schema;
  * queries with planted signal must be non-empty. The exact-value check
  * against DuckDB is the driver's job (tools/verify_local.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose result is legitimately empty at this scale
  private val mayBeEmpty = Set("q22_cosine_pairs", "q19_simhash_pairs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name with an oracle has a query; oracle coverage is near-total") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // rows-only exceptions must stay rare and intentional (q21: xxhash64
    // planes not SQL-expressible; q61/q67: approximate sketch estimates)
    assert((qs -- os) ==
      Set("q21_ann_lsh_topk", "q61_distinct_sketch", "q67_quantile_sketch"),
      s"unexpected rows-only: ${qs -- os}")
  }
}
