package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the whole-operator Catalyst extension tier
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), used where the
  * built-in operators genuinely cannot express the physical shape:
  *
  * For every left row, attach the LATEST right row of the same key with
  * `right.ts <= left.ts` (ties on ts resolved by the highest `tie` — the
  * same order as `ORDER BY ts, tie` with last-match-wins). Spark has no
  * as-of join; the declarative encodings are either a union + running
  * `last(ignoreNulls)` window (one blended sort of BOTH inputs, nullable
  * carry columns — q28's form) or a range join + per-left argmax (a second
  * aggregate shuffle). This operator is the shape a column-store engine
  * uses: hash-partition each side on the key, sort each side
  * `(key, ts[, tie])` WITHIN partitions, then a single linear merge walk
  * per partition — no blended table, no second shuffle, no window state;
  * `EnsureRequirements` inserts exactly those exchanges/sorts from the
  * declared requirements, and AQE still sizes them.
  *
  * Engine conventions: key/ts/tie are LongType (quantize first, as
  * everywhere); the right side's columns come back nullable (no match →
  * nulls). An optional `toleranceMs` bounds the lookback (merge_asof
  * semantics): a candidate older than `ts − tolerance` is no match.
  * Ordinal access only — no per-row field lookups.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    toleranceMs: Option[Long] = None)
    extends BinaryNode {
  require(Seq(leftKey, leftTs, rightKey, rightTs, rightTie).forall(_.dataType == LongType),
    "as-of join key/ts/tie columns must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, tol) :: Nil
    case _ => Nil
  }

  /** Idempotent per-session install (the `spark.sql.extensions` variant is
    * [[graft.expressions.GraftExtensions]]). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
  }

  /** DataFrame front door: `asofJoin(trades, quotes, "k","ts", "k","ts","id")`.
    * Output = left columns + right columns (nullable; rename clashes on the
    * right BEFORE calling). The right side is re-aliased to fresh exprIds so
    * self-joins (left and right derived from the same scan) stay
    * unambiguous. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String, rightTie: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right: Alias allocates new ids, so a self-join
    // never carries duplicate attribute ids into the binary node
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, leftKey), attr(lPlan, leftTs),
        attr(rPlan, rightKey), attr(rPlan, rightTs), attr(rPlan, rightTie),
        toleranceMs))
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    toleranceMs: Option[Long] = None)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash-partition both sides on the key (EnsureRequirements co-partitions
  // them, exactly as for a sort-merge join) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ... and sort within partitions: left (key, ts), right (key, ts, tie) —
  // the tie sort makes "last right row with ts <= left ts" deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against nullable-widened right attrs: with the child's
      // nullable=false the projection would elide the null check and read
      // 0s out of the all-null no-match row
      val proj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRow = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // NULL semantics: a NULL key/ts can never satisfy "latest with
      // ts <= left.ts" — null-keyed/ts rights are skipped, null-keyed/ts
      // lefts emit unmatched. Ascending sort puts NULLS FIRST, so the
      // skips happen at the front of each run and the walk stays monotone.
      def rHeadNull: Boolean =
        rBuf.head.isNullAt(rKeyOrd) || rBuf.head.isNullAt(rTsOrd)
      // the latest right row seen for candidateKey (copied: iterator rows
      // are reused by the upstream sort)
      var candidate: InternalRow = null
      var candidateKey = 0L
      var candidateTs = 0L
      val tol = toleranceMs.getOrElse(-1L)
      lIter.map { lRow =>
        if (lRow.isNullAt(lKeyOrd) || lRow.isNullAt(lTsOrd)) {
          proj(joined(lRow, nullRow))
        } else {
          val k = lRow.getLong(lKeyOrd)
          val t = lRow.getLong(lTsOrd)
          // drain every right row ordered before/at (k, t); rows of earlier
          // keys are dead (left is sorted), rows of key k advance the candidate
          var continue = rBuf.hasNext
          while (continue) {
            if (rHeadNull) { rBuf.next(); continue = rBuf.hasNext }
            else {
              val head = rBuf.head
              val hk = head.getLong(rKeyOrd)
              if (hk < k || (hk == k && head.getLong(rTsOrd) <= t)) {
                val row = rBuf.next()
                if (hk == k) {
                  candidate = row.copy()
                  candidateKey = k
                  candidateTs = row.getLong(rTsOrd)
                }
                continue = rBuf.hasNext
              } else continue = false
            }
          }
          // tolerance (merge_asof-style lookback bound): a candidate older
          // than ts - tolerance is treated as no match
          val matched = candidate != null && candidateKey == k &&
            (tol < 0 || t - candidateTs <= tol)
          proj(joined(lRow, if (matched) candidate else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
