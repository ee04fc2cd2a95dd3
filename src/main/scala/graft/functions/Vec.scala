package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` columns, expressed with
  * Spark SQL higher-order functions so the whole computation stays inside
  * Catalyst (no UDF serialization, spillable, Tungsten-friendly).
  *
  * Mirrors the reference's embedding math:
  *  - dot product / cosine of normalized vectors
  *    (reference: src/embeddings.py:149-155 `compute_similarity`)
  *  - L2 normalization (reference: src/embeddings.py:52-56,
  *    `normalize_embeddings=True`)
  *
  * All accumulation is done in DOUBLE regardless of input element type, so
  * results are reproducible against the DuckDB oracle (left-to-right fold,
  * same operation order).
  */
object Vec {

  /** Σ a_i * b_i, accumulated left-to-right in double — a native codegen
    * expression (see [[DotProduct]]); bit-identical to the equivalent
    * `aggregate(zip_with(...))` higher-order-function form.
    */
  def dot(a: Column, b: Column): Column =
    Columns.of(DotProduct(Columns.expr(a), Columns.expr(b)))

  /** √(Σ a_i²) */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two (not necessarily normalized) vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Rescale to unit L2 norm (double elements). Zero vectors map to zeros. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => when(n === 0.0, 0.0).otherwise(x.cast("double") / n))
  }

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)
}
