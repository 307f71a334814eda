package graft

/** Every registered query must run at sf0.001 and produce a stable schema;
  * queries with planted signal must be non-empty. The exact-value check
  * against DuckDB is the driver's job (tools/verify_local.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose result is legitimately empty at this scale (q256: the
  // synthetic 31-word vocabulary has no inflection — StemSpec carries the
  // behavioral evidence on an inflected vocabulary)
  private val mayBeEmpty =
    Set("q22_cosine_pairs", "q19_simhash_pairs", "q256_stem_families")

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

  test("every query name with an oracle has a query; oracle coverage is total") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // every query is oracle-verified: the approximate ones (q21 LSH, q61
    // HLL, q67 quantile sketch) carry deterministic/exact companion output
    // so the driver can hash-match them too
    assert((qs -- os).isEmpty, s"unexpected rows-only: ${qs -- os}")
  }

  test("no query name collides across wave modules (Map ++ would silently drop one)") {
    val perModule = SparkEntry.defSets.map(_.keySet)
    val merged = SparkEntry.queries.keySet
    assert(perModule.map(_.size).sum == merged.size,
      s"colliding names: ${perModule.flatten.groupBy(identity).collect {
        case (k, vs) if vs.size > 1 => k
      }.mkString(",")}")
  }
}
