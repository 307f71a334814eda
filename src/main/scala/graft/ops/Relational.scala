package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators — the batch-relational surface of the
  * reference CDC pipeline (SURVEY.md §2.1/§2.3). Each is a thin, declarative
  * composition of Catalyst-optimizable primitives: filters/projections push
  * into the parquet scan, aggregations get map-side partial aggregation, and
  * windows shuffle once on the partition key.
  *
  * Scale notes (100 TB): every per-key operator here shuffles exactly once on
  * the key; none collects to the driver; `argMaxPerKey`'s agg form uses
  * `max_by` (partial-aggregable, no window sort) which is the shape that
  * survives a 1000-executor scale-up best.
  */
object Relational {

  /** O3 — source-pushed IN filter (reference
    * `EcommerceTransactionsLogEventsStream.kt:80-85`). */
  def filterIn(df: DataFrame, colName: String, values: Seq[String]): DataFrame =
    df.filter(col(colName).isin(values: _*))

  /** O2 — resume-at / offset seek: drop the log prefix before `fromMs`
    * (reference `resumeAt`, `EcommerceTransactionsLogEventsStream.kt:91`).
    * On a date-partitioned log this is partition pruning. */
  def resumeSeek(df: DataFrame, tsMsCol: String, fromMs: Long): DataFrame =
    df.filter(col(tsMsCol) >= fromMs)

  /** O7 — deterministic dedup: keep exactly one row per key, the first by
    * `ordering` (reference's Redis `SET NX` per event id,
    * `CdcLockService.kt:40-50`; Spark needs no lock — hash shuffle on the
    * key makes per-key processing serial). */
  def dedupFirstPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O10 — arg-max per key: the value of `payload` on the latest row by
    * `(orderCol desc, tieCol desc)` (reference's "status if newer" guard,
    * `TransactionViewUpsertService.kt:134-149`). Aggregation form — no
    * window sort, partial-aggregable: `max_by(payload, struct(order, tie))`. */
  def argMaxPerKey(orderCol: Column, tieCol: Column, payload: Column, as: String): Column =
    max(struct(orderCol.as("o"), tieCol.as("t"), payload.as("v"))).getField("v").as(as)

  /** O11 — last non-null value per key by event order (reference's
    * unconditional enrichment update, `TransactionViewUpsertService.kt:201-211`:
    * "fields are not overridden by other events" — the latest event that
    * *sets* the field wins). Encoded as `max_by` over the non-null subset. */
  def lastNonNullPerKey(valueCol: Column, orderCol: Column, tieCol: Column, as: String): Column =
    max(when(valueCol.isNotNull, struct(orderCol.as("o"), tieCol.as("t"), valueCol.as("v"))))
      .getField("v").as(as)

  /** O9 — scalar CASE mapping (the per-event-type status mapping,
    * `TransactionViewUpsertService.kt:308-659`). */
  def caseMap(c: Column, mapping: Seq[(String, String)], default: String): Column =
    coalesce(
      mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
        when(c === k, lit(v)).otherwise(acc)
      },
      lit(default))

  /** AS-OF semantics as a running window: for every row, the latest
    * non-null `value` among rows up to and including it in `w`'s order —
    * the union-and-scan form of an as-of join (tag the right side's
    * payload, union, one window pass). One shuffle on the window key;
    * no range-join explosion. */
  def asofLast(value: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    last(value, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Sessionization: monotone session index per key — a new session starts
    * when the gap from the previous row (in `orderCol` order) exceeds
    * `gapMs`. Two window passes over one shuffle on the key. */
  def sessionize(df: DataFrame, keys: Seq[String], orderCol: Column,
      tieCol: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol, tieCol)
    df.withColumn("__prev_ts", lag(orderCol, 1).over(w))
      .withColumn("__new_session",
        (col("__prev_ts").isNull || orderCol - col("__prev_ts") > gapMs).cast("long"))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Dense 1-based global index in the total order `ordering`, WITHOUT a
    * single-partition window. Two-phase:
    *
    *   1. range-repartition on the order keys (the one full-data shuffle)
    *      + local sort; partitions are globally ordered, and
    *      `monotonically_increasing_id` then yields a dense 0-based LOCAL
    *      sequence per partition (`mid - min(mid)` — mid's low 33 bits
    *      are the in-partition record number).
    *   2. per-partition `(count, min(mid))` — a partial-aggregated pass
    *      producing one row per partition — turned into exclusive prefix
    *      offsets (a window over #partitions rows, trivially small) and
    *      broadcast-joined back. global = offset(pid) + (mid - base) + 1.
    *
    * Nothing ever concentrates the data on one task, so this survives any
    * input size; the cost is the range shuffle plus one recompute of the
    * sorted lineage for the counts side (deterministic: RangePartitioner's
    * sampling is seeded per input partition, and `ordering` must be a
    * total order — same contract as the oracle's ROW_NUMBER).
    *
    * CALLER OBLIGATION (applies to [[globalCumSum]] too): the sorted
    * frame is persisted via [[Dedup.cacheTracked]] — load-bearing for
    * correctness, see the comment in the body — and the entry lives
    * until `Dedup.unpersistIntermediates(spark)` runs. Bench/Verify/
    * TimeQ/Plans call it after every query action; a long-lived session
    * embedding these operators as a library must do the same after each
    * consuming action, or MEMORY_AND_DISK entries accumulate without
    * bound (round-6 ADVICE).
    */
  def globalIndex(df: DataFrame, ordering: Seq[Column], as: String): DataFrame =
    globalIndexWithTotal(df, ordering, as, totalAs = None)

  /** [[globalIndex]] that ALSO emits the input's total row count as a
    * column (`totalAs`) — for FREE: the total is the sum of the
    * per-partition counts the two-phase index already aggregates and
    * broadcasts, so consumers that previously ran a separate count
    * aggregate + crossJoin(broadcast(tot)) just to normalize their rank
    * (the q127/q168/q189 stacked-rank shape) drop one job and one
    * broadcast (round-9). */
  def globalIndexWithTotal(
      df: DataFrame,
      ordering: Seq[Column],
      as: String,
      totalAs: Option[String]): DataFrame = {
    // withColumnRenamed on a name the input already carries would emit a
    // frame with DUPLICATE column names — later resolution fails ambiguously
    // far from the cause (ADVICE r9). `as` is safe: withColumn replaces.
    totalAs.foreach { t =>
      require(!df.columns.contains(t),
        s"globalIndexWithTotal: totalAs '$t' collides with an input column")
    }
    // persisted (tracked): the counts side and the join side BOTH read
    // `sorted`, and correctness requires they see the SAME partition
    // layout. An un-persisted recompute is only deterministic while the
    // upstream plan is — if any subtree's cache materializes between the
    // two executions (measured: a memoized pinned core built mid-query),
    // RangePartitioner samples a differently-partitioned input, the two
    // sides disagree on __pid, and the inner join silently DROPS rows.
    // One shared InMemoryRelation removes the recompute entirely.
    val sorted = Dedup.checkpointTracked(df.repartitionByRange(ordering: _*)
      .sortWithinPartitions(ordering: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id()))
    val counts = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"), min("__mid").as("__base"))
    // one row per partition (~tasks rows): the constant partition key is
    // semantically the no-partition window but skips WindowExec's
    // move-everything warning, which would otherwise read like a scale bug.
    // pmod(__pid, 1) not lit(0): Spark 4's EliminateWindowPartitions folds
    // a LITERAL partition key to the empty spec, resurrecting the warning —
    // a column-referencing constant is not foldable, so the spec survives
    val wAll = Window.partitionBy(pmod(col("__pid"), lit(1)))
    val offsets = counts.withColumn(
      "__offset",
      coalesce(
        sum(col("__cnt")).over(
          wAll.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(
        wAll.orderBy("__pid").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val joined = sorted
      .join(broadcast(offsets.select("__pid", "__base", "__offset", "__tot")), "__pid")
      .withColumn(as, col("__offset") + (col("__mid") - col("__base")) + lit(1L))
    totalAs.fold(joined.drop("__tot"))(t => joined.withColumnRenamed("__tot", t))
      .drop("__pid", "__mid", "__base", "__offset", "__cnt")
  }

  /** Global inclusive running sum of `valueCol` in the total order
    * `ordering`, WITHOUT a single-partition window — the same two-phase
    * shape as [[globalIndex]], generalized from counting to summing:
    *
    *   1. range-repartition on the order keys + local sort; a window
    *      partitioned by `spark_partition_id()` computes the
    *      partition-LOCAL running sum (32-way parallel — each window
    *      group is one whole partition, so nothing concentrates).
    *   2. per-partition totals (one row per partition) → exclusive prefix
    *      offsets via a window over #partitions rows → broadcast back.
    *      global cumsum = offset(pid) + local cumsum.
    *
    * This is the building block for any "running total over the whole
    * corpus" semantics (sequence packing, quota assignment, cumulative
    * byte budgets) at sizes where `Window.orderBy` with no partition —
    * which moves ALL rows to one task — would be the q10-class
    * scale-killer (VERDICT r1 #1). */
  def globalCumSum(df: DataFrame, ordering: Seq[Column], valueCol: Column, as: String): DataFrame = {
    // persisted (tracked) for the same two-consumer layout-consistency
    // reason as globalIndex
    val sorted = Dedup.checkpointTracked(df.repartitionByRange(ordering: _*)
      .sortWithinPartitions(ordering: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long")))
    val localW = Window.partitionBy("__pid").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = sorted.groupBy("__pid").agg(sum("__v").as("__t"))
    val offsets = totals.withColumn(
      "__offset",
      coalesce(
        sum(col("__t")).over(
          // non-foldable constant partition key: see globalIndex — same
          // tiny input, no move-everything warning, survives
          // EliminateWindowPartitions
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    sorted
      .withColumn("__local", sum(col("__v")).over(localW))
      .join(broadcast(offsets.select("__pid", "__offset")), "__pid")
      .withColumn(as, col("__offset") + col("__local"))
      .drop("__pid", "__v", "__local", "__offset", "__t")
  }

  /** Skew-safe equi-join: salt the left side's rows into `salt` sub-keys
    * (hash of a unique tiebreak column — deterministic, uniform), replicate
    * the right side once per salt value, join on (key, salt). The result
    * is value-identical to the plain join (spec-pinned); the point is the
    * SHUFFLE layout: a hot key's rows land on `salt` tasks instead of one.
    *
    * This is the explicit lever for skew AQE can't fix: AQE's skew-join
    * only splits sort-merge partitions at runtime, and only when the join
    * is the last thing in the stage — a grouped aggregate right after, or
    * a broadcast-ineligible build side, leaves the hot task in place.
    * Replication cost: |right| × salt rows shuffled, so use for
    * moderate-size right sides (dimension tables) against a skewed fact. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftTieCol: Column, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(leftTieCol), lit(salt)))
    val r = right.withColumn("__salt", explode(array((0 until salt).map(lit(_)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Ordered funnel: per key, the first time each stage was reached, where
    * stage i counts only at-or-after the first reach of stage i-1 (the
    * classic view→click→purchase conversion question; a MATCH_RECOGNIZE
    * subset). `stages` maps stage name → row predicate.
    *
    * Shape: ONE shuffle on the key; each stage adds a running-min window
    * column over the same window spec (one sort, chained WindowExecs), and
    * the inclusive frame makes "stage i-1 reached as of this row" a null
    * check on the previous stage's running min. The final per-key reduce
    * reuses the window's hash partitioning — no second shuffle. Tie rows
    * at the same `orderCol` are sequenced by `tieCol`, so the result is
    * deterministic on any input order. */
  def funnel(df: DataFrame, keys: Seq[String], orderCol: Column, tieCol: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = stages.zipWithIndex.foldLeft(df) { case (cur, ((name, pred), i)) =>
      val qualified =
        if (i == 0) pred
        else pred && col(s"__reach_${stages(i - 1)._1}").isNotNull
      cur.withColumn(s"__reach_$name", min(when(qualified, orderCol)).over(w))
    }
    staged.groupBy(keys.map(col): _*)
      .agg(
        min(col(s"__reach_${stages.head._1}")).as(s"t_${stages.head._1}"),
        stages.tail.map { case (name, _) =>
          min(col(s"__reach_$name")).as(s"t_$name")
        }: _*)
  }

  /** Range join as an EQUI-join: match each left row to the right rows with
    * the same `key` and `rightTs` in [`leftTs`, `leftTs` + `windowMs`).
    *
    * Spark plans a raw time-inequality join as a broadcast-nested-loop (or
    * worse, a cartesian) — O(|L|·|R|) per key and the classic range-join
    * scale-killer. Binning restores the hash shuffle: right rows get their
    * `windowMs`-wide time bucket, left rows explode to the (at most) TWO
    * buckets their window can overlap, the join runs on (key, bucket) —
    * shuffle-partitionable, AQE-skew-splittable — and the exact inequality
    * is a post-join filter. A right row's single bucket matches at most one
    * of a left row's two candidate buckets, so no dedup is needed.
    *
    * `leftTs`/`rightTs` must be differently-named epoch-ms columns; all
    * other column names must be disjoint apart from `key`. */
  def binnedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMs: Long): DataFrame = {
    val lb = left.withColumn("__bin", explode(array(
      expr(s"$leftTs div ${windowMs}L"),
      expr(s"$leftTs div ${windowMs}L + 1"))))
    val rb = right.withColumn("__bin", expr(s"$rightTs div ${windowMs}L"))
    lb.join(rb, Seq(key, "__bin"))
      .filter(col(rightTs) >= col(leftTs) && col(rightTs) < col(leftTs) + lit(windowMs))
      .drop("__bin")
  }

  /** O17 — checkpoint cadence: mark every Nth record in a total order
    * (reference saves the resume token every 5 events,
    * `EcommerceTransactionsLogEventsStream.kt:144-149`). Built on
    * [[globalIndex]] — fully partition-parallel, no single-task window. */
  def checkpointCadence(df: DataFrame, ordering: Seq[Column], n: Int): DataFrame = {
    globalIndex(df, ordering, "checkpoint_seq")
      .filter(pmod(col("checkpoint_seq"), lit(n.toLong)) === 0)
  }

  /** Top-k rows per group by `(ordCol DESC, idCol ASC)` WITHOUT a window:
    * the standard `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
    * sorts every group's full row set inside each task before discarding
    * all but k — at corpus scale that is a sort of the whole table to keep
    * a sliver. Here the [[graft.expressions.TopKDot]] bounded heap runs as
    * a map-side partial aggregate (ObjectHashAggregate), so each task
    * forwards ≤ k `(ord, id)` entries per group it saw and the exchange
    * carries ≤ k·tasks rows per group instead of the group's rows.
    *
    * Returns `(groupCols*, rank, idCol, ordCol)` with rank 1..k in
    * `(ord DESC, id ASC)` order — the deterministic tie-break the SQL
    * window form shares. `ordCol`/`idCol` must be long-typed (quantize
    * money/ratios first, as everywhere in this engine). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      ordCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"topKPerGroup needs k > 0, got $k")
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function(graft.expressions.GraftFunctions.TopKDotName,
        col(ordCol), col(idCol), lit(k)).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("long").as("rank"),
        col("__e.neighbor_id").as(idCol),
        col("__e.dot").as(ordCol)): _*)
  }
}
