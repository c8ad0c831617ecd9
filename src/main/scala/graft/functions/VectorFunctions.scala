package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions over ArrayType(FloatType) columns.
  *
  * Re-expresses the reference's cosine scoring (sklearn
  * `cosine_similarity`, /root/reference/backend/ai_service.py:44-57) as pure
  * Catalyst higher-order-function compositions — codegen'd, no UDFs, and
  * DuckDB-oracle-checkable (`list_cosine_similarity`). SURVEY.md §2.9 F13.
  *
  * All arithmetic is promoted to DOUBLE; scores are computed per-query and
  * never materialized to storage (mirrors ai_service.py:113 semantics).
  */
object VectorFunctions {

  /** dot(a, b) with double accumulation. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dotProduct(a, a)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; null-safe on null arrays.
    *
    * Dispatches to the fused native Catalyst expression
    * ([[graft.functions.expressions.CosineSimilarity]], single codegen'd
    * loop) unless -Dgraft.cosine.impl=hof selects the pure-builtin HOF
    * composition. Both accumulate sequentially in double and are
    * bit-equal (asserted in FunctionsSpec), so the oracle contract is
    * implementation-independent. */
  def cosine(a: Column, b: Column): Column =
    if (sys.props.get("graft.cosine.impl").contains("hof")) cosineHof(a, b)
    else graft.functions.expressions.CosineSimilarity.cosine_native(a, b)

  /** The five-pass builtin-HOF formulation (SURVEY F13). */
  def cosineHof(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance (used by the LSH bucketed path). */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))
}
