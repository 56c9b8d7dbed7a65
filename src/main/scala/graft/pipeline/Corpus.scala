package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level operations a large-scale training-data pipeline needs
  * around the per-document ops in [[Dedup]]/[[TextAnalysis]]:
  * reproducible sampling, corpus statistics, and benchmark-contamination
  * checks.
  *
  * Scale design:
  *  - [[stratifiedSample]] is a pure FILTER — no shuffle, no state, and
  *    (unlike `df.sample`) deterministic across retries/executors, which
  *    is what makes a training mix reproducible. Per-stratum rates are a
  *    driver-side map compiled into one CASE expression.
  *  - [[ngramTopK]] is explode → map-side-combinable count → TakeOrdered:
  *    one shuffle on the n-gram, top-k never materializes the full sorted
  *    aggregate.
  *  - [[contamination]] broadcasts the (small) benchmark shingle set and
  *    counts distinct overlaps per document: the train side stays a
  *    narrow (doc_id, shingle) stream, the eval side is the broadcast —
  *    the layout that still works when "train" is 100 TB and "eval" is a
  *    handful of benchmarks.
  *  - [[lengthStats]] is a single map-side-combinable aggregation with
  *    exact percentiles per language (languages are few ⇒ tiny final
  *    shuffle; per-group state is the sorted token-count multiset, fine
  *    for per-LANGUAGE groups — use approx_percentile instead if grouping
  *    by something high-cardinality).
  */
object Corpus {

  /** TWO MINSTD rounds over the Mersenne prime M = 2³¹−1:
    * state = ((id mod M)·A mod M)·A mod M with A = 48271. Two rounds,
    * not one: a single round keeps an input stride s intact whenever
    * s·A < M (no modular wrap — e.g. ids in steps of 100 give
    * s·A = 4 827 100 ≡ 0 mod 100, putting EVERY row in one bucket);
    * the second multiply always wraps for s ≥ 2, breaking the
    * progression. Measured keep-rate on stride-100/1000/10⁶ id sets:
    * 0.244–0.249 at a nominal 0.25. (A plain `(id·a) mod den` is not a
    * hash at all: it collapses to `(id mod den)·(a mod den) mod den`.)
    * `state·A < 2⁴⁷` keeps both multiplies ANSI-overflow-safe. */
  private val LcgM = 2147483647L
  private val LcgA = 48271L

  /** Deterministic per-row keep decision: MINSTD²-hash the (non-negative)
    * id and keep when `state mod den < num`. SQL-mirrorable (plain
    * integer arithmetic — DuckDB has no xxhash64); for production
    * sampling keyed on adversarial ids swap in `pmod(xxhash64(col), den)`
    * via the `hash` parameter of [[stratifiedSample]]. */
  def lcgBucket(id: Column, den: Int): Column =
    pmod(pmod(pmod(id, lit(LcgM)) * lit(LcgA), lit(LcgM)) * lit(LcgA), lit(LcgM)) %
      lit(den.toLong)

  /** Reproducible stratified sampling: keep a row iff its id-hash bucket
    * (out of `den`) falls below the stratum's numerator (`rates`, with
    * `defaultNum` for unlisted strata). rate = num/den per stratum. */
  def stratifiedSample(
      docs: DataFrame, rates: Map[String, Int], defaultNum: Int, den: Int = 100,
      strataCol: String = "lang", idCol: String = "doc_id",
      hash: (Column, Int) => Column = lcgBucket(_, _)): DataFrame = {
    require(den > 0 && rates.values.forall(n => n >= 0 && n <= den) &&
      defaultNum >= 0 && defaultNum <= den, "rates must be within [0, den]")
    val numCol = rates.foldLeft(lit(defaultNum.toLong)) { case (acc, (stratum, num)) =>
      when(col(strataCol) === stratum, lit(num.toLong)).otherwise(acc)
    }
    docs.filter(hash(col(idCol), den) < numCol)
  }

  /** Corpus-wide top-k n-word shingles by document frequency (distinct
    * shingles per doc, so boilerplate repeated inside one document counts
    * once). Deterministic tie-break: count DESC, shingle ASC. */
  def ngramTopK(docs: DataFrame, k: Int = 100, n: Int = 3,
      textCol: String = "text"): DataFrame =
    Explodes.explodeNoInfer(
        Dedup.withShingles(docs.select(col(textCol)), textCol, n),
        Seq.empty, col("sh"), "ngram")
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram").asc)
      .limit(k)

  /** Benchmark-contamination check: for each train document, the number
    * of distinct n-word shingles it shares with the eval corpus. Returns
    * only contaminated docs (overlap > 0) — at scale the clean majority
    * never leaves the filter. */
  def contamination(train: DataFrame, eval_ : DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalShingles = Explodes.explodeNoInfer(
      Dedup.withShingles(eval_.select(col(textCol)), textCol, n),
      Seq.empty, col("sh"), "ngram").distinct()
    Explodes.explodeNoInfer(
        Dedup.withShingles(train.select(col(idCol), col(textCol)), textCol, n),
        Seq(col(idCol)), col("sh"), "ngram")
      .join(broadcast(evalShingles), "ngram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_ngrams")) // shingles are distinct per doc
  }

  /** Per-language corpus length statistics over whitespace token counts:
    * doc count, mean (6 dp), and exact p50/p95/p99 (linear interpolation —
    * matches DuckDB `quantile_cont` for the oracle). */
  def lengthStats(docs: DataFrame, textCol: String = "text",
      strataCol: String = "lang"): DataFrame = {
    val nTokens = size(Dedup.tokens(col(textCol))).cast("long")
    docs.select(col(strataCol), nTokens.as("n_tokens"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 6).as("mean_tokens"),
        round(expr("percentile(n_tokens, 0.5)"), 6).as("p50"),
        round(expr("percentile(n_tokens, 0.95)"), 6).as("p95"),
        round(expr("percentile(n_tokens, 0.99)"), 6).as("p99"))
  }
}
