package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused int8 embedding quantization — one compiled pass per vector.
  *
  * The declarative form (`int8Quantize(quantize(v), qmaxAbs(quantize(v)))`
  * over higher-order functions) is semantically right but an optimizer
  * trap: HOF lambdas are interpreted, and both `CollapseProject` and the
  * filter that `InferFiltersFromGenerate` pushes below the explode inline
  * the `qscale` aggregate INTO the per-element lambda — every element then
  * re-evaluates the whole quantize+max subtree, turning O(dim) per vector
  * into O(dim²) interpreted evals (measured: 2.0 s of q55's 1.5 s total at
  * sf0.1 was this filter+projection chain on 2 000 × 64-dim vectors).
  * Fusing the three steps into one codegen'd scalar makes every inlined
  * copy a single compiled loop, so optimizer duplication is harmless.
  *
  * Semantics are bit-identical to the HOF pipeline (same floor/double
  * arithmetic, spec-pinned): vq_i = floor(double(x_i)·1000), scale =
  * max(0, max |vq_i|), q8_i = scale > 0 ? floor(double(vq_i·127)/scale) : 0;
  * null elements pass through as null and are skipped for the scale,
  * matching `transform` + null-skipping `greatest`.
  */
object VectorQuantUtil {

  /** Returns struct(qscale BIGINT, q8 array<BIGINT>). Called from generated
    * code — keep the signature Java-simple. */
  def int8(arr: ArrayData, isFloat: Boolean, scale: Int): InternalRow = {
    val n = arr.numElements()
    val vq = new Array[java.lang.Long](n)
    var qscale = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val v = math.floor(x * scale).toLong
        vq(i) = v
        val a = math.abs(v)
        if (a > qscale) qscale = a
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (vq(i) != null) {
        out(i) =
          if (qscale > 0) math.floor((vq(i) * 127L).toDouble / qscale.toDouble).toLong
          else 0L
      } else if (qscale == 0L) {
        // the HOF reference's when(qscale > 0, ...).otherwise(0L) is
        // per-element UNCONDITIONAL in the zero-scale branch: a null
        // element of an all-null/all-zero vector maps to 0, not null
        out(i) = 0L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](qscale, new GenericArrayData(out)))
  }
}

/** `graft_int8_quantize(array<float|double>)` →
  * `struct<qscale: bigint, q8: array<bigint>>`. */
case class Int8QuantizeVec(child: Expression, scale: Int = 1000)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", LongType, nullable = false),
    StructField("q8", ArrayType(LongType, containsNull = true), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_int8_quantize"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) if scale > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> and a positive literal scale, " +
        s"got ${child.dataType.simpleString} with scale=$scale")
  }

  override def nullSafeEval(in: Any): Any =
    VectorQuantUtil.int8(in.asInstanceOf[ArrayData], isFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorQuantUtil.int8($c, $isFloat, $scale);")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeVec =
    copy(child = newChild)
}
