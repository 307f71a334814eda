package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import graft.{SparkSpec, Tables}
import graft.expressions.GraftFunctions

/** SQL front door: the operator library's surface must be reachable from
  * pure `spark.sql` text — a SQL-first user (BI tool, notebook cell,
  * Thrift server) never writes Scala. One board query per family runs
  * here as SQL ONLY and must reproduce the Scala-API result exactly:
  * dedup (q15), custom-expression dedup (q18, `graft_simhash64` resolved
  * by the SQL parser), as-of (q28), windowed aggregation (q32), and the
  * injected range-join optimizer rule on a natural-SQL inequality join
  * (the q60 family's rewrite). Session wiring is the documented install
  * path: [[GraftFunctions.register]] per session, or
  * `spark.sql.extensions=graft.expressions.GraftExtensions` cluster-wide
  * (same injection, pinned by GraftExtensionsSpec). */
class SqlFrontDoorSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withViews[T](f: => T): T = {
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.eventsCents(spark, sfDir).createOrReplaceTempView("events_cents")
    try f
    finally Seq("documents", "events", "events_cents")
      .foreach(spark.catalog.dropTempView(_))
  }

  private def sameRows(sql: DataFrame, api: DataFrame): Unit = {
    assert(sql.columns.toSeq == api.columns.toSeq,
      s"column mismatch: ${sql.columns.toSeq} vs ${api.columns.toSeq}")
    val s = sql.collect().map(_.toSeq)
    val a = api.collect().map(_.toSeq)
    assert(s.length == a.length, s"row count ${s.length} vs ${a.length}")
    s.zip(a).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs: $x vs $y")
    }
  }

  private val NormSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[\\\\p{Punct}]', ''), '\\\\s+', ' '))"

  test("q15 exact dedup runs as pure SQL (dedup family)") {
    withViews {
      sameRows(
        spark.sql(
          s"""WITH fp AS (SELECT doc_id, md5($NormSql) AS fingerprint FROM documents),
             |c AS (SELECT fingerprint, min(doc_id) AS canonical_id,
             |             count(1) AS group_size
             |      FROM fp GROUP BY fingerprint)
             |SELECT fp.doc_id, fp.fingerprint, c.canonical_id, c.group_size,
             |       CAST(fp.doc_id != c.canonical_id AS INT) AS is_dup
             |FROM fp JOIN c USING (fingerprint)
             |ORDER BY doc_id""".stripMargin),
        DataPrepQueries.q15_exact_dedup(spark, sfDir))
    }
  }

  test("q18 simhash runs as pure SQL — the injected graft_simhash64 resolves in the parser") {
    GraftFunctions.register(spark)
    withViews {
      sameRows(
        spark.sql(
          s"""SELECT doc_id, graft_simhash64(toks) AS simhash
             |FROM (SELECT doc_id,
             |             CASE WHEN length(norm) = 0 THEN CAST(array() AS ARRAY<STRING>)
             |                  ELSE split(norm, '\\\\s+') END AS toks
             |      FROM (SELECT doc_id, $NormSql AS norm FROM documents))
             |WHERE size(toks) >= 1
             |ORDER BY doc_id""".stripMargin),
        DataPrepQueries.q18_simhash(spark, sfDir))
    }
  }

  test("q28 as-of join runs as pure SQL (as-of family)") {
    withViews {
      sameRows(
        spark.sql(
          """SELECT event_id, user_id, ts_ms, asof_click_id, asof_click_ts
            |FROM (
            |  SELECT event_id, user_id, ts_ms, event_type,
            |         last(CASE WHEN event_type = 'click' THEN event_id END, true)
            |           OVER w AS asof_click_id,
            |         last(CASE WHEN event_type = 'click' THEN ts_ms END, true)
            |           OVER w AS asof_click_ts
            |  FROM (SELECT event_id, user_id, ts_ms, event_type,
            |               CAST(event_type = 'purchase' AS INT) AS is_purchase
            |        FROM events WHERE event_type IN ('click', 'purchase'))
            |  WINDOW w AS (PARTITION BY user_id
            |               ORDER BY ts_ms, is_purchase, event_id
            |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            |WHERE event_type = 'purchase'
            |ORDER BY event_id""".stripMargin),
        CdcQueries.q28_asof_click(spark, sfDir))
    }
  }

  test("q32 tumbling windows run as pure SQL (windowed family)") {
    withViews {
      sameRows(
        spark.sql(
          """SELECT user_id,
            |       CAST(CAST(w.start AS LONG) * 1000 AS LONG) AS window_start_ms,
            |       n_events, purchase_c
            |FROM (SELECT user_id, window(timestamp_millis(ts_ms), '1 hour') AS w,
            |             count(1) AS n_events,
            |             sum(CASE WHEN event_type = 'purchase' THEN value_c
            |                      ELSE CAST(0 AS BIGINT) END) AS purchase_c
            |      FROM events_cents
            |      GROUP BY user_id, window(timestamp_millis(ts_ms), '1 hour'))
            |ORDER BY user_id, window_start_ms""".stripMargin),
        CdcQueries.q32_windowed_counts(spark, sfDir))
    }
  }

  test("a natural SQL range join plans as the binned equi-join under the injected rule") {
    import graft.plans.BinnedRangeJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    try withViews {
      // the natural way a SQL user writes "follow-on activity within 1h":
      // a pure inequality join — unrewritten this is a nested-loop scan
      val sql = spark.sql(
        """SELECT count(1) AS n, sum(f.value_c) AS v
          |FROM (SELECT ts_ms AS s_ts FROM events_cents
          |      WHERE event_type = 'signup') s
          |JOIN (SELECT ts_ms AS f_ts, value_c FROM events_cents) f
          |  ON f.f_ts >= s.s_ts AND f.f_ts < s.s_ts + CAST(3600000 AS LONG)""".stripMargin)
      val plans = collectAllPlans(executedPlan(sql))
      assert(!plans.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "the injected rule must replace the nested-loop range join")
      // ground truth from the un-rewritten plan
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
      val naive = spark.sql(
        """SELECT count(1) AS n, sum(f.value_c) AS v
          |FROM (SELECT ts_ms AS s_ts FROM events_cents
          |      WHERE event_type = 'signup') s
          |JOIN (SELECT ts_ms AS f_ts, value_c FROM events_cents) f
          |  ON f.f_ts >= s.s_ts AND f.f_ts < s.s_ts + CAST(3600000 AS LONG)""".stripMargin)
      assert(sql.collect().toSeq == naive.collect().toSeq)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
  }
  test("q142 BM25 retrieval runs as pure SQL (retrieval family)") {
    withViews {
      import SearchQueries.{Bm25Terms, Bm25K, K1x1k, Bx1k}
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      sameRows(
        spark.sql(
          s"""WITH d AS (
             |  SELECT doc_id, filter(split($NormSql, ' '), x -> x != '') AS toks
             |  FROM documents),
             |dd AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS dl FROM d),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |               CAST(sum(dl) AS BIGINT) AS total_dl FROM dd),
             |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM (SELECT doc_id, dl, explode(toks) AS term FROM dd)
             |       WHERE term IN ($termList)
             |       GROUP BY doc_id, dl, term),
             |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
             |s AS (
             |  SELECT tf.doc_id,
             |         (${1000L - Bx1k} + ($Bx1k * tf.dl * t.n_docs) div t.total_dl) AS norm_x1k,
             |         (1000 * (t.n_docs - dfr.df + 1)) div (dfr.df + 1) AS idf_x1k,
             |         (tf.tf * ${K1x1k + 1000L} * 1000)
             |           div (tf.tf * 1000 + ($K1x1k * (${1000L - Bx1k} + ($Bx1k * tf.dl * t.n_docs) div t.total_dl)) div 1000)
             |           AS tfsat_x1k
             |  FROM tf JOIN dfr USING (term) CROSS JOIN tot t),
             |sc AS (SELECT doc_id, CAST(sum((idf_x1k * tfsat_x1k) div 1000) AS BIGINT) AS score,
             |              CAST(count(*) AS BIGINT) AS n_terms_hit
             |       FROM s GROUP BY doc_id),
             |top AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
             |        FROM sc)
             |SELECT rank, doc_id, score, n_terms_hit
             |FROM top WHERE rank <= $Bm25K ORDER BY rank""".stripMargin),
        SearchQueries.q142_bm25_topk(spark, sfDir))
    }
  }

}
