package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Everything is expression-based (`org.apache.spark.sql.functions` +
  * higher-order array functions) — no UDFs — so plans stay inside Tungsten
  * and shuffle only where the algorithm requires it:
  *
  *  - [[exact]]: one hash-aggregate shuffle on the content column.
  *  - [[minhashPairs]]: MinHash+LSH — per-row signature computation is
  *    embarrassingly parallel (single project), candidate generation is a
  *    self-equi-join on (band, bandHash) buckets — O(candidates), never the
  *    O(n²) all-pairs. At 100 TB the band join is the only shuffle; skewed
  *    buckets (boilerplate text) should be capped/salted — see
  *    `maxBucketSize`.
  *  - [[simhashPairs]]: 64-bit SimHash, blocked on 16-bit chunks (any pair
  *    within Hamming distance 16 shares a chunk by pigeonhole when d<=3 per
  *    chunk-region; standard 4-chunk blocking catches d<=~6 reliably).
  *  - [[ngramJaccardPairs]]: exact word-shingle Jaccard within
  *    (lang, length-bucket) blocks — the deterministic, oracle-checkable
  *    counterpart of MinHash.
  */
object Dedup {

  /** Exact dedup: canonical (minimum) id + duplicate count per identical
    * content value. Single map-side-combinable aggregation. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select("doc_id", "dup_cnt")

  // ---- shared text prep ----------------------------------------------------

  def tokens(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  /** Distinct n-word shingles; shorter docs collapse to a single shingle. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = tokens(textCol)
    val count = greatest(size(toks) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  // ---- MinHash + LSH ---------------------------------------------------------

  /** 120 hashes = 15 bands x 8 rows: s-curve threshold (1/15)^(1/8) ~= 0.71,
    * so pairs with true Jaccard >= 0.8 are caught with prob > 0.99. */
  val NumHashes = 120
  val Bands = 15
  val Rows = 8

  /** MinHash signature (array<bigint>, length [[NumHashes]]) of a shingle
    * array — one pass over the shingles per row, no shuffle. The hash
    * family is xxhash64 re-seeded by the function index k (each shingle's
    * base hash is computed once, then k mixes it) — deterministic across
    * runs/executors and safe under ANSI mode (no wrapping arithmetic). */
  def minhashSignature(shingleCol: Column): Column = {
    val hs = transform(shingleCol, s => xxhash64(s))
    transform(sequence(lit(0), lit(NumHashes - 1)),
      k => array_min(transform(hs, h => xxhash64(h, k))))
  }

  /** One murmur3 bucket id per band (hash of the band's signature slice). */
  def bandHashes(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => hash(slice(sig, b * Rows + 1, lit(Rows))))

  /** Near-duplicate pairs (a < b) with exact shingle-Jaccard >= threshold.
    *
    * `maxBucketSize` drops pathological LSH buckets (all-identical
    * boilerplate) before the self-join — at web scale a handful of huge
    * buckets otherwise dominate the join (quadratic blowup); dropping them
    * is standard practice (dedup within them via exact-hash instead). */
  def minhashPairs(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.8, maxBucketSize: Int = 10000): DataFrame = {

    val prep = docs.select(
        col(idCol).as("id"),
        shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh")))

    val banded = prep
      .select(col("id"), posexplode(bandHashes(col("sig"))).as(Seq("band", "bh")))

    val okBuckets = banded.groupBy("band", "bh").count()
      .filter(col("count") <= maxBucketSize && col("count") > 1)
      .select("band", "bh")

    val inBuckets = banded.join(okBuckets, Seq("band", "bh"))

    val cand = inBuckets.alias("x").join(inBuckets.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

    val sets = prep.select(col("id"), col("sh"))
    cand
      .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ---- SimHash ---------------------------------------------------------------

  private val Pow2: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** 64-bit SimHash over distinct 3-word shingles: per-bit ±1 vote from
    * each shingle's xxhash64, sign of the vote sum sets the bit.
    * Single-pass `aggregate` — no explode, no shuffle. */
  def simhash(textCol: Column): Column = {
    val hs = transform(shingles(textCol), t => xxhash64(t))
    val votes = aggregate(hs, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, Pow2,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    aggregate(zip_with(votes, Pow2, (v, p) => when(v > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Near-duplicate pairs by SimHash Hamming distance, blocked on the four
    * 16-bit chunks (pairs within distance `maxHamming` share at least one
    * chunk with high probability for small distances). */
  def simhashPairs(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 6): DataFrame = {

    val prep = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
    val chunks = array((0 until 4).map(c =>
      shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = prep.select(col("id"), col("sim"),
      posexplode(chunks).as(Seq("chunk", "cv")))

    chunked.alias("x").join(chunked.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- exact n-gram Jaccard (blocked) -----------------------------------------

  /** Exact 3-word-shingle Jaccard within (lang, n_chars/100) blocks —
    * deterministic and SQL-expressible, used as the DuckDB-checkable
    * counterpart of MinHash. Blocking keeps the pair count linear-ish:
    * near-duplicates land in the same length bucket. */
  def ngramJaccardPairs(
      docs: DataFrame, threshold: Double = 0.5): DataFrame = {

    val prep = docs.select(
      col("doc_id").as("id"), col("lang"),
      floor(col("n_chars") / 100).as("blk"),
      shingles(col("text")).as("sh"))

    prep.alias("x").join(prep.alias("y"),
        col("x.lang") === col("y.lang") && col("x.blk") === col("y.blk") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
              size(array_union(col("x.sh"), col("y.sh"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
