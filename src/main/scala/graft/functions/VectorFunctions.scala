package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns using
  * only built-in higher-order functions (`zip_with`, `aggregate`) — fully
  * codegen'd, no UDF, no driver round-trip. All arithmetic is promoted to
  * double for stability.
  */
object VectorFunctions {

  /** Native fused kernel ([[VecDotExpression]]) — the zip_with+aggregate
    * composition it replaces boxed every element and dominated vector-
    * similarity profiles.
    */
  def dot(a: Column, b: Column): Column = VecDotExpression.vecDot(a, b)

  /** The built-in composition the kernel replaces (kept as the
    * correctness cross-check).
    */
  private[graft] def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v
    ))

  /** Deterministic pseudo-random unit in [-0.5, 0.5] from (plane, dim)
    * via integer hashing — replaces RNG-sampled hyperplanes so LSH
    * signatures are reproducible across runs and executors.
    */
  private def hashUnit(plane: Int, dimIdx: Column): Column =
    (pmod(xxhash64(lit(plane), dimIdx), lit(1000003L)).cast("double") /
      lit(1000003.0)) - lit(0.5)

  /** Sign bit of the projection of `vec` onto deterministic hyperplane
    * `plane` (random-hyperplane LSH for cosine similarity).
    */
  def hyperplaneSign(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") * hashUnit(plane, i)),
      lit(0.0),
      (acc, v) => acc + v
    )
    when(proj >= 0.0, lit(1)).otherwise(lit(0))
  }

  /** `nBits`-bit LSH signature for cosine similarity: vectors with small
    * angle agree on most bits, so bucketing on the signature (or bands of
    * it) turns an O(n²) all-pairs search into per-bucket joins.
    * Native fused kernel ([[LshSign64Expression]]), bit-compatible with
    * [[lshSignatureBuiltin]].
    */
  def lshSignature(vec: Column, nBits: Int): Column =
    LshSign64Expression.lshSign64(vec, nBits)

  /** The band split of an `nBits × nBands` hyperplane signature —
    * `array<struct<__band, __sig>>`, one bucket key per band. ONE
    * definition shared by the LSH searcher
    * ([[graft.operators.Similarity.lshTopK]]) and the banded semantic
    * decontamination screen, whose recall contract is "buckets
    * IDENTICALLY to the searcher" — sharing the code is what enforces
    * it.
    */
  def lshBands(vec: Column, nBits: Int, nBands: Int): Column = {
    require(nBits > 0 && nBands > 0 && nBits * nBands <= 64,
      s"nBits*nBands must fit the 64-bit signature, got $nBits*$nBands")
    // JVM shifts mod 64: (1L << 64) - 1 == 0, which would mask every
    // signature to bucket 0 and collapse the band join to all-pairs.
    val mask = if (nBits == 64) -1L else (1L << nBits) - 1
    val sig = lshSignature(vec, nBits * nBands)
    array((0 until nBands).map { b =>
      struct(lit(b).as("__band"),
        shiftrightunsigned(sig, b * nBits).bitwiseAND(lit(mask)).as("__sig"))
    }: _*)
  }

  /** The per-plane built-in composition the kernel replaces (string of
    * '0'/'1' per plane; kept as the correctness cross-check).
    */
  private[graft] def lshSignatureBuiltin(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map(p => hyperplaneSign(vec, p).cast("string"))
    concat(bits: _*)
  }
}
