package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / mixing / packing — the ops between "curated corpus"
  * and "training shards" in an LLM data pipeline:
  *
  *  - deterministic stratified sampling (train/test splits, per-source
  *    quotas) that yields the SAME membership on any engine,
  *  - domain-mixture re-weighting toward a target distribution,
  *  - concat-and-chunk sequence packing (GPT-style: concatenate docs in
  *    a deterministic order, slice every `budget` tokens),
  *  - seeded global shuffle into training shards.
  *
  * Scale shape: sampling is a narrow filter (no shuffle); packing and
  * shuffling do ONE hash exchange on the shard key and run their windows
  * PARTITIONED BY shard — never a global ORDER BY window, which would
  * collapse to a single partition and cap the job at one core at 100 TB.
  *
  * Determinism over raw entropy: membership hashes use an explicit
  * multiplicative hash over the id (below) rather than `rand()` or an
  * engine-private hash, so a split computed here is reproducible by any
  * other system (DuckDB, Trino, a Python check script) from the id alone —
  * train/test splits must survive engine migrations. The constant is the
  * 2^64 golden-ratio multiplier (Knuth multiplicative hashing) reduced to
  * arithmetic that stays inside non-overflowing int64 under ANSI mode.
  */
object Sampling {

  /** Hash bucket count for membership decisions: rates are resolved at
    * micro-precision (rate 0.25 keeps buckets [0, 250000)). */
  val Buckets = 1000000L

  // id is folded mod 2^40 before the multiply so id*A + seed stays well
  // under 2^63 (ANSI overflow is an error, not a wrap); 131071 = 2^17-1
  // (a Mersenne prime) spreads consecutive ids across buckets.
  private val FoldMod = 1L << 40
  private val MultA = 131071L

  /** Deterministic per-id bucket in [0, Buckets): engine-portable
    * (pure int64 arithmetic — the DuckDB spelling is
    * `(id % 2^40 + seed) * 131071 % 1000000`). The seed is added BEFORE
    * the multiply: an additive-after-multiply seed would only rotate the
    * bucket space, leaving membership sets near-identical across seeds. */
  def sampleBucket(id: Column, seed: Long): Column =
    pmod((pmod(id, lit(FoldMod)) + lit(seed)) * lit(MultA), lit(Buckets))

  /** Deterministic stratified Bernoulli sample: keep a row iff its bucket
    * falls below `rate(stratum) * Buckets`. A narrow filter — no shuffle,
    * runs inside the scan stage; strata without a configured rate use
    * `defaultRate`. Rates are configuration, not data, so they compile to
    * a literal CASE (no join). */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: Long = 17L, idCol: String = "doc_id"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "sampling rates must be in [0, 1]")
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    docs.filter(
      sampleBucket(col(idCol), seed) < (rateCol * lit(Buckets.toDouble)))
  }

  /** Per-domain mixture diagnostics against a target distribution:
    * observed share, weight = target/observed, the Bernoulli `down_rate`
    * that realizes the target by down-sampling (capped at 1), and the
    * integer `repeats` an up-sampling epoch plan needs. One aggregation
    * on ~|domains| keys; the global total joins back over an unbounded
    * window on the already-aggregated (tiny) frame. */
  def mixtureWeights(docs: DataFrame, domainCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.values.forall(_ >= 0), "target shares must be >= 0")
    // domains absent from the target map get share 0.0 => weight 0 (drop)
    val targetOf = target.foldLeft(lit(0.0)) { case (acc, (k, s)) =>
      when(col("domain") === lit(k), lit(s)).otherwise(acc)
    }
    docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("domain"), col("n"),
        round(col("n") / col("total"), 6).as("share"),
        round(targetOf / (col("n") / col("total")), 4).as("weight"))
      .withColumn("down_rate", least(lit(1.0), col("weight")))
      .withColumn("repeats", greatest(lit(1L), ceil(col("weight")).cast("long")))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * (shard, id) order and sliced every `budget` tokens; each doc reports
    * the chunk its first token lands in and whether it straddles a chunk
    * boundary (training can then drop or re-pad straddlers). Token count
    * is the whitespace spelling ([[TextAnalysis]]' simplest counter) so an
    * external oracle can recompute it.
    *
    * The running offset is a cumulative sum PARTITIONED BY shard — shards
    * pack independently and in parallel (exactly how multi-writer packing
    * works on a cluster); one exchange total. */
  def packChunks(docs: DataFrame, budget: Long = 2048L, shards: Int = 8,
      seed: Long = 29L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val tok = size(split(col(textCol), " ")).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("id"),
        pmod(sampleBucket(col(idCol), seed), lit(shards.toLong)).as("shard"),
        tok.as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("start_off") / lit(budget)))
      .withColumn("straddles",
        floor((col("start_off") + col("n_tok") - 1) / lit(budget)) =!=
          col("chunk_id"))
  }

  /** Seeded deterministic global shuffle into `shards` training shards:
    * shard = bucket mod shards, position = rank of the bucket within the
    * shard (ties broken by id — total order is deterministic). Windows
    * partition by shard; the only exchange is the shard hash. The same
    * (seed, shards) reproduces the identical permutation anywhere. */
  def seededShuffle(docs: DataFrame, shards: Int = 8, seed: Long = 43L,
      idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val b = sampleBucket(col(idCol), seed)
    docs.select(col(idCol).as("id"), b.as("bucket"),
        pmod(b, lit(shards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("bucket"), col("id"))))
      .select(col("id"), col("shard"), col("pos"))
  }

  /** Materialize [[seededShuffle]] as on-disk training shards: parquet
    * partitioned by shard, rows within each shard file in shuffle order.
    * `repartition(shard)` + in-partition sort = one exchange, then each
    * shard writes sequentially — the 1000-executor write path. */
  def writeShards(docs: DataFrame, path: String, shards: Int = 8,
      seed: Long = 43L, idCol: String = "doc_id"): Unit = {
    val shuffled = seededShuffle(docs, shards, seed, idCol)
      .join(docs.withColumnRenamed(idCol, "id"), Seq("id"))
    shuffled
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
