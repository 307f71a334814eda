package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd integer dot product of two `array<bigint>` columns.
  *
  * This is the engine's one custom Catalyst `Expression` (SURVEY.md §2.4
  * allows them only where built-ins genuinely can't keep up): the
  * higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per row — on the ANN/near-dup queries (800 k pairs × 64-dim
  * at sf0.1) that interpretation dominated the runtime. `doGenCode` emits a
  * tight primitive loop that stays inside whole-stage codegen; `eval`
  * keeps the interpreted fallback semantically identical (both are exact
  * BIGINT math, same results as the DuckDB oracle).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: Spark 4 made AbstractDataType private[sql] —
  // input checking is done via checkInputDataTypes instead, so SQL misuse
  // is an analysis error, not a runtime ClassCastException
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}); " +
        "ragged inputs evaluate over the common prefix (min length)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val DotLong = "graft_dot_long"
  val TopKDotName = "graft_topk_dot"
  val MinHashSigName = "graft_minhash_sig"
  val SimHash64Name = "graft_simhash64"
  val Int8QuantizeName = "graft_int8_quantize"
  val SlidingMinName = "graft_sliding_min_distinct"
  val CappedCollectName = "graft_capped_collect"
  val WinnowFpsName = "graft_winnow_fps"
  val SortedPairsName = "graft_sorted_pairs"
  val CdcChunksName = "graft_cdc_chunks"
  val CharGramsName = "graft_char_grams"
  val CharGramCountsName = "graft_char_gram_counts"
  val CharGramCodesName = "graft_char_gram_codes"

  /** Literal-int extraction for builder lambdas (k arguments must be
    * foldable — a non-literal k is a registration-time error, not a
    * runtime surprise). */
  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, s"expected a literal int argument, got $e")
    e.eval().asInstanceOf[Int]
  }

  /** Idempotently register the engine's custom expressions on a session.
    * Called from the operators that use them (the driver hands us a bare
    * SparkSession, so registration can't assume a config entry point);
    * a `SparkSessionExtensions` injection would be the cluster-install
    * variant of the same wiring. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering an existing name logs a WARN per call —
    // 29 queries × 2 functions of pure noise in the bench/verify logs
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(DotLong)))
      reg.createOrReplaceTempFunction(
        DotLong, exprs => ArrayDotLong(exprs.head, exprs(1)), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(TopKDotName)))
      reg.createOrReplaceTempFunction(
        TopKDotName, exprs => TopKDot(exprs.head, exprs(1), exprs(2)), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(MinHashSigName)))
      reg.createOrReplaceTempFunction(
        MinHashSigName, exprs => MinHashSig(exprs.head, litInt(exprs(1))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(SimHash64Name)))
      reg.createOrReplaceTempFunction(
        SimHash64Name, exprs => SimHash64(exprs.head), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(Int8QuantizeName)))
      reg.createOrReplaceTempFunction(
        Int8QuantizeName, exprs => Int8QuantizeVec(exprs.head), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(SlidingMinName)))
      reg.createOrReplaceTempFunction(
        SlidingMinName, exprs => SlidingMinDistinct(exprs.head, litInt(exprs(1))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(CappedCollectName)))
      reg.createOrReplaceTempFunction(
        CappedCollectName, exprs => CappedCollectLongs(exprs.head, exprs(1)), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(WinnowFpsName)))
      reg.createOrReplaceTempFunction(
        WinnowFpsName, exprs => WinnowFps(exprs.head, litInt(exprs(1)), litInt(exprs(2))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(SortedPairsName)))
      reg.createOrReplaceTempFunction(
        SortedPairsName, exprs => SortedPairs(exprs.head), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(CdcChunksName)))
      reg.createOrReplaceTempFunction(
        CdcChunksName, exprs => CdcChunks(exprs.head, litInt(exprs(1))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(CharGramsName)))
      reg.createOrReplaceTempFunction(
        CharGramsName, exprs => CharGrams(exprs.head, litInt(exprs(1))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(CharGramCountsName)))
      reg.createOrReplaceTempFunction(
        CharGramCountsName, exprs => CharGramCounts(exprs.head, litInt(exprs(1))), "scala_udf")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(CharGramCodesName)))
      reg.createOrReplaceTempFunction(
        CharGramCodesName, exprs => CharGramCodes(exprs.head, litInt(exprs(1))), "scala_udf")
  }
}
