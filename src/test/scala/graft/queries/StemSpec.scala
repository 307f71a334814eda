package graft.queries

import graft.SparkSpec

/** X282 — the suffix-strip stemmer on a REAL inflected vocabulary (the
  * driver corpus has none, so q256's behavioral evidence lives here):
  * rule precedence, length guards, and family consolidation. */
class StemSpec extends SparkSpec {
  import spark.implicits._

  private def families(tokens: (String, Long)*) =
    GateQueries.stemFamilies(tokens.toSeq.toDF("token", "tf"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("plural + base consolidate; -ed stems separately (first-match rules)") {
    val f = families(("merge", 10L), ("merges", 4L), ("merged", 2L))
    // merges → merge (rule -s); merged → merg (rule -ed) stays a singleton
    assert(f.keySet == Set("merge"), s"got $f")
    assert(f("merge") == (2L, 14L, "merge"))
  }

  test("-ing and -ies rules, with length guards protecting short tokens") {
    val f = families(
      ("sorting", 3L), ("sort", 7L), ("sorts", 1L),   // sorting→sort, sorts→sort
      ("queries", 2L), ("queri", 1L),                  // queries→queri (ies→i)
      ("ring", 5L),                                    // len 4 ≤ 5: NOT stripped
      ("class", 6L), ("classes", 1L))                  // ss kept; sses→ss → 'classe'? no: classes→class?
    assert(f("sort") == (3L, 11L, "sort"), s"got $f")
    assert(f("queri") == (2L, 3L, "queri"), s"got $f")
    assert(!f.contains("r"), "short -ing token must not be stripped")
  }

  test("sses → ss joins the ss-kept base; bare s-words under the guard stay") {
    val f = families(("glasses", 2L), ("glass", 9L), ("gas", 4L), ("ga", 1L))
    // glasses (>4, sses) → glasse? NO: drop 2 → 'glass'; glass (ss) kept
    assert(f("glass") == (2L, 11L, "glass"), s"got $f")
    // 'gas' has length 3 ≤ 3: the -s rule must NOT fire (no 'ga' family)
    assert(!f.contains("ga"), s"length guard must protect 'gas': $f")
  }
}
