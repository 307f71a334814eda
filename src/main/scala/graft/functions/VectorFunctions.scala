package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over `array<float>` columns —
  * similarity-search / near-dup primitives built from Spark's higher-order
  * functions (`transform`/`zip_with`/`aggregate`). No UDFs, no driver-side
  * math. NOTE: HOF lambdas evaluate interpreted (not codegen'd), and
  * optimizer inlining can duplicate an outer aggregate into a lambda body
  * (O(dim²) blowup — see [[graft.expressions.Int8QuantizeVec]]); hot paths
  * use the fused expressions ([[graft.expressions.ArrayDotLong]],
  * [[graft.expressions.Int8QuantizeVec]]) with these as the declarative
  * reference semantics.
  *
  * Oracle-exactness: similarity is computed on INTEGER-quantized vectors
  * (`floor(x * 1000)` per element) so dot products are exact BIGINT
  * arithmetic — immune to float-summation-order divergence between Spark
  * and DuckDB. The quantization is part of the metric's definition, not an
  * approximation knob (at 1e-3 resolution the top-k ordering of unit-norm
  * embeddings is stable).
  */
object VectorFunctions {

  /** Deterministic ±1 sign matrix from md5 parity: entry (j, i) is +1 iff
    * the first hex nibble of md5("seed:j:i") is even — the q21 hyperplane
    * convention, reproducible in ANSI SQL as
    * `strpos('02468ace', substr(md5(concat(seed, ':', j, ':', i)), 1, 1)) > 0`,
    * so operators built on it (LSH hyperplanes, random projections) stay
    * oracle-exact. Computed driver-side once and shipped as literals. */
  def md5SignMatrix(seed: String, rows: Int, cols: Int): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until rows).map(j => (0 until cols).map { i =>
      val h = md.digest(s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((h(0) >> 4) & 0x1) == 0) 1L else -1L
    })
  }

  /** `array<float>` → `array<bigint>`, elementwise floor(x*1000). Floats
    * widen to double exactly, so this is deterministic across engines. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Squared L2 norm of a quantized vector (BIGINT-exact). */
  def qnorm2(v: Column): Column =
    aggregate(v, lit(0L), (acc, x) => acc + x * x)

  /** Exact squared L2 distance between two quantized vectors. */
  def qdist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Double cosine similarity from quantized parts — for ranking/tests
    * (derived from exact integers, so cross-engine stable when only
    * compared, not hashed). */
  def qcosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  /** Max absolute element of a quantized vector (the symmetric-quantization
    * scale denominator), BIGINT-exact. */
  def qmaxAbs(qv: Column): Column =
    aggregate(qv, lit(0L), (acc, x) => greatest(acc, abs(x)))

  /** Symmetric int8 quantization of a quantized(1000) vector: each element
    * maps to floor(127·x / scale) for scale = max |element| (0-vectors map
    * to all zeros). Integer inputs + IEEE-exact double division + floor
    * make the result identical across engines — the storage-compression
    * step (4 bytes/float → 1 byte) an embedding pipeline applies before
    * shipping vectors to an index, expressed as a pure codegen'd scalar. */
  def int8Quantize(qv: Column, qscale: Column): Column =
    transform(qv, x =>
      when(qscale > 0, floor(x * lit(127L) / qscale)).otherwise(lit(0L)).cast("long"))

  /** Random-hyperplane LSH bucket for cosine similarity: `nBits` sign bits
    * of pseudo-random ±1 projections. Hyperplane j's coefficient on
    * coordinate i is `sign(xxhash64(j, i))` — deterministic, shipped as
    * code, no side table, identical on every executor. Returns a BIGINT
    * bucket id in [0, 2^nBits).
    *
    * Scale path: bucketing turns the O(N·Q) brute-force scan into a
    * shuffle-join on (bucket), with multi-probe = union over neighboring
    * buckets. Not oracle-SQL-expressible (xxhash64); verified by a recall
    * test against the brute-force oracle instead.
    */
  def rhpBucket(qv: Column, nBits: Int, table: Int = 0): Column =
    (0 until nBits).map { j =>
      val signedSum = aggregate(
        zip_with(qv, sequence(lit(1), size(qv)), (x, i) =>
          when(xxhash64(lit(table * nBits + j), i) % 2 === 0, x).otherwise(-x)),
        lit(0L), (acc, x) => acc + x)
      when(signedSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic ±1 hyperplane coefficients from MD5 parity: coordinate
    * `i` of plane `plane` is +1 iff the first hex nibble of
    * `md5("<plane>:<i>")` is even. MD5 of a UTF-8 string is the SAME
    * function in the JVM (`MessageDigest`), Spark (`md5()`), and DuckDB
    * (`md5()`), so a bucketing built on these planes is exactly
    * reproducible in plain SQL — which buys the LSH family a hash-exact
    * DuckDB oracle (the q31 trick, applied to random-hyperplane LSH).
    * Computed once driver-side and shipped as a literal array: the hot
    * path never evaluates md5 per element. */
  def md5PlaneSigns(plane: Int, dim: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val h = md.digest(s"$plane:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((h(0) >> 4) & 0x1) == 0) 1L else -1L
    }
  }

  /** Random-hyperplane LSH bucket with [[md5PlaneSigns]] coefficients —
    * same geometry as [[rhpBucket]] (sign bits of `nBits` ±1 projections)
    * but oracle-expressible. `dim` fixes the plane table's width; vectors
    * are projected on their first `dim` coordinates (embedding columns
    * have uniform dimension, so in practice all of them).
    *
    * The ±1 projection is a DOT PRODUCT against the literal sign vector,
    * so it rides the codegen'd [[graft.expressions.ArrayDotLong]] instead
    * of a zip_with/aggregate lambda pair (round 11): higher-order
    * functions are CodegenFallback, and ONE of them in a projection
    * knocks the whole scoring stage out of whole-stage codegen — the
    * q21 candidate stage ran ~14 µs/row interpreted. Values unchanged. */
  def md5RhpBucket(qv: Column, nBits: Int, table: Int, dim: Int): Column = {
    (0 until nBits).map { j =>
      val signs = md5PlaneSigns(table * nBits + j, dim)
      val signedSum = org.apache.spark.sql.functions.call_function(
        graft.expressions.GraftFunctions.DotLong, qv, typedLit(signs))
      when(signedSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
