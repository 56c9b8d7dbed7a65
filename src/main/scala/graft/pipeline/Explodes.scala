package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `explode`/`posexplode` without the `InferFiltersFromGenerate` tax.
  *
  * For a non-outer generate, Catalyst infers a `size(arr) > 0` pre-filter
  * so empty-array rows die before the Generate. Predicate pushdown then
  * substitutes the array's PRODUCER EXPRESSION into that condition as it
  * sinks below the staging projections — and when the array is built by a
  * higher-order function, the producer lands inside the lambda body,
  * where Catalyst performs no common-subexpression elimination and
  * re-evaluates it PER ARRAY ELEMENT (see the staged-projection note on
  * [[Dedup.shinglesFromTokens]]). Measured on [[Corpus.ngramTopK]] at
  * sf0.1: 0.44 s of shingle work became 2.8 s because the inferred filter
  * re-derived `split(lower(trim(text)))` inside its lambda, once per
  * shingle.
  *
  * An OUTER generate gets no inferred filter. For arrays whose elements
  * are never null (every array this package explodes: concat_ws shingles,
  * xxhash64 longs, SRP codes), `explode_outer` + a post-generate
  * `isNotNull` filter is row-for-row identical to `explode` — null/empty
  * arrays contribute no rows — and the null filter references only the
  * generated attribute, so nothing is re-derived.
  *
  * Do NOT use for arrays that may CONTAIN null elements: plain explode
  * keeps such rows, these helpers drop them.
  */
private[graft] object Explodes {

  /** `df.select(keep :+ explode(arr).as(as))` minus the inferred-filter
    * recomputation. Precondition: array elements are never null. */
  def explodeNoInfer(df: DataFrame, keep: Seq[Column], arr: Column,
      as: String): DataFrame =
    df.select(keep :+ explode_outer(arr).as(as): _*)
      .filter(col(as).isNotNull)

  /** `posexplode` variant; same precondition. */
  def posexplodeNoInfer(df: DataFrame, keep: Seq[Column], arr: Column,
      posAs: String, as: String): DataFrame =
    df.select(keep :+ posexplode_outer(arr).as(Seq(posAs, as)): _*)
      .filter(col(as).isNotNull)
}
