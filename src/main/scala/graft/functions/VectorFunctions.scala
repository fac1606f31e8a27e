package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, built from
  * higher-order functions (`zip_with`/`aggregate`) so they stay inside
  * codegen — no UDF boxing per element.
  *
  * Determinism: every element is cast float→double (exact) and the
  * reduction is `aggregate`'s sequential left fold — the same order a
  * C++ loop uses, so results bit-match the DuckDB oracle (verified
  * empirically at build time on all sf0.01 pairs).
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def vdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def vnorm(a: Column): Column = sqrt(vdot(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = vdot(a, b) / (vnorm(a) * vnorm(b))

  /** Squared L2 distance (monotone with L2 — cheaper for ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-random-projection LSH signature: `planes` pseudo-random
    * hyperplanes derived deterministically from a splitmix64 sequence —
    * no stored model, reproducible across runs. Returns an int bucket id
    * in [0, 2^planes). The scale path for similarity search: candidates
    * are restricted to one bucket, turning an all-pairs join into an
    * equi-join on bucket.
    *
    * The hyperplane coefficients are computed once on the driver and
    * embedded as array literals, so the per-row work is `planes` pure
    * multiply-add folds inside codegen.
    */
  def srpBucket(vec: Column, planes: Int, dims: Int = 64, seed: Long = 42L): Column = {
    val bits = srpPlanes(planes, dims, seed).zipWithIndex.map { case (coeffs, p) =>
      val proj = aggregate(
        zip_with(vec, typedLit(coeffs), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The hyperplane coefficient matrix behind [[srpBucket]] — public so
    * an external checker (e.g. a SQL oracle) can embed the SAME planes
    * as literals and reproduce bucket assignments bit-for-bit. */
  def srpPlanes(planes: Int, dims: Int = 64, seed: Long = 42L): Seq[Array[Double]] =
    (0 until planes).map(p => Array.tabulate(dims)(i => splitmixUnit(seed + p * 1000003L + i)))

  /** splitmix64 finalizer → uniform double in [-0.5, 0.5). */
  private def splitmixUnit(x0: Long): Double = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
}
