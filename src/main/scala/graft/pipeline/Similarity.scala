package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * All math is done with higher-order array expressions in double precision
  * (deterministic left-to-right folds — reproducible across engines and
  * cluster sizes). No UDFs.
  *
  * Scale design:
  *  - [[bruteForceTopK]] broadcasts the (small) query set and scans the
  *    corpus once: cost O(|Q|·N·d) FLOPs, one shuffle for the per-query
  *    top-k (partial `row_number` prune happens map-side via
  *    TakeOrdered-style window + filter under AQE).
  *  - [[lshTopK]] buckets vectors by a deterministic random-hyperplane
  *    sign code and only compares within matching buckets — the 100 TB
  *    path: candidate generation is an equi-join on the code, so the
  *    all-pairs scan disappears; recall is tunable via `planes` (code
  *    width) and `probes` is emulated by comparing codes within Hamming
  *    distance 1 (bit-flip expansion of the query code).
  */
object Similarity {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Generic HOF dot product — interpreted per element; fine for one-off
    * per-row use, too slow for the per-candidate hot path (use [[dotFixed]]
    * with a known dimension there: unrolled, whole-stage-codegen'd, and the
    * same left-to-right summation order, so results are bit-identical). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Fused-loop native expression (see graft.functions.DotProduct); the
    * `dim` parameter is kept for API stability but unnecessary — the
    * codegen'd loop runs over the arrays' common length. */
  def dotFixed(a: Column, b: Column, dim: Int): Column = GraftFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normFixed(a: Column, dim: Int): Column = sqrt(dotFixed(a, a, dim))

  /** Embedding dimension of the fixture corpus (embeddings.parquet). */
  val DefaultDim = 64

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded). Similarity is rounded to 6 dp before ranking
    * (with id tie-break) so results are stable across summation orders. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, dim: Int = DefaultDim,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)

    // repartition: spread the O(|Q|·N·d) dot-product work across cores even
    // when the corpus arrives as a single input split
    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
      .repartition(col("nid"))
      .withColumn("cnorm", normFixed(col("cv"), dim))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qnorm", normFixed(col("qv"), dim))

    val sims = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dotFixed(col("qv"), col("cv"), dim) /
              (col("qnorm") * col("cnorm")), 6).as("sim"))

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "sim", "rank")
  }

  /** Deterministic ±1 hyperplane signs from a seeded RNG — shared between
    * the Spark plan and the DuckDB oracle-SQL generator (PipelineEntries),
    * so both engines evaluate identical planes. */
  def planeSigns(planes: Int, dim: Int, seed: Long): Seq[Seq[Boolean]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextBoolean()))
  }

  /** Plane sign vectors as literal arrays — evaluated once per row, codegen'd. */
  private def planeLits(planes: Int, dim: Int, seed: Long): Seq[Column] =
    planeSigns(planes, dim, seed).map(signs =>
      array(signs.map(s => lit(if (s) 1.0 else -1.0)): _*))

  /** Sign-random-projection code: bit p set iff v · plane_p > 0. */
  def srpCode(v: Column, planes: Int, dim: Int, seed: Long = 7L): Column =
    planeLits(planes, dim, seed).zipWithIndex.map { case (p, i) =>
      when(dotFixed(v, p, dim) > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Multi-table LSH ANN (classic (L, b) sign-random-projection scheme):
    * L independent b-bit code tables; a corpus vector is a candidate if it
    * shares a code with the query in ANY table (plus Hamming-1 probes per
    * table). Exact cosine + top-k within candidates.
    *
    * Recall for bit-agreement prob p is 1−(1−p^b)^L — tuned via (L, b);
    * b should grow ~log2(N) so bucket occupancy stays constant. Candidate
    * generation is an equi-join on (table, code): at 100 TB this replaces
    * the all-pairs scan with L bounded bucket joins. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, planes: Int = 6,
      tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)

    def codes(v: Column): Column = array((0 until tables).map(t =>
      srpCode(v, planes, dim, seed = 7L + t * 1000L)): _*)

    // Vectors and codes are SEPARATE tables: the bucket join + candidate
    // dedup flow only (id, table, code) — two longs and a short — never the
    // 64-double embedding payload. Round 1 carried the vectors through the
    // candidate join, which multiplied the shuffled bytes by the bucket
    // occupancy (quadratic in corpus-per-bucket: the sf1 bench spent 68 s
    // here). Vectors re-join AFTER the (qid, nid) distinct, so each dot
    // product is computed exactly once per unique candidate pair.
    val cVecs = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
      .repartition(col("nid"))
      .withColumn("cnorm", normFixed(col("cv"), dim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cCodes = cVecs.select(col("nid"),
      posexplode(codes(col("cv"))).as(Seq("tbl", "code")))

    val qVecs = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qnorm", normFixed(col("qv"), dim))
    // per-table probe expansion: own code + all Hamming-1 codes
    val probes = array((col("qcode") +: (0 until planes).map(i =>
      col("qcode").bitwiseXOR(lit(1L << i)))): _*)
    val qProbes = qVecs
      .select(col("qid"), posexplode(codes(col("qv"))).as(Seq("tbl", "qcode")))
      .withColumn("probe", explode(probes))
      .select(col("qid"), col("tbl").as("qtbl"), col("probe"))

    val candIds = cCodes.join(broadcast(qProbes),
        col("tbl") === col("qtbl") && col("code") === col("probe") &&
        col("qid") =!= col("nid"))
      .select("qid", "nid")
      .distinct() // a candidate may match several tables/probes

    val sims = candIds
      .join(broadcast(qVecs), "qid")
      .join(cVecs, "nid")
      .select(col("qid"), col("nid"),
        round(dotFixed(col("qv"), col("cv"), dim) /
              (col("qnorm") * col("cnorm")), 6).as("sim"))

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate PAIRS: all (a < b) with
    * cosine(v_a, v_b) >= threshold — the embedding-space member of the
    * dedup family (exact, MinHash, SimHash, n-gram, embedding-cosine).
    *
    * Candidate generation is multi-table SRP-LSH with Hamming-1 probes,
    * never all-pairs: for true near-duplicates (threshold >= ~0.9,
    * angle <= ~26°) the per-table bit-agreement probability p = 1 − θ/π
    * makes the L-table miss rate (1 − (p^b + b·p^(b−1)(1−p)))^L
    * negligible. Same two scale disciplines as [[lshTopK]]: the bucket
    * join flows only (id, table, code) with the vectors re-joined once
    * per unique candidate pair, and `maxBucketSize` caps degenerate
    * buckets (a corpus of near-identical vectors). Exact cosine verify
    * on the deduplicated pair set. */
  def cosinePairs(
      vectors: DataFrame, threshold: Double = 0.95, planes: Int = 8,
      tables: Int = 6, dim: Int = 64, maxBucketSize: Int = 10000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)

    def codesArr(v: Column): Column = array((0 until tables).map(t =>
      srpCode(v, planes, dim, seed = 7L + t * 1000L)): _*)

    val vecs = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .withColumn("nrm", normFixed(col("v"), dim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = vecs.select(col("id"),
      posexplode(codesArr(col("v"))).as(Seq("tbl", "code")))

    val okBuckets = codes.groupBy("tbl", "code").count()
      .filter(col("count") <= maxBucketSize && col("count") > 1)
      .select("tbl", "code")
    val inBuckets = codes.join(okBuckets, Seq("tbl", "code"))

    // Hamming-1 coverage with an equi-join: LEFT side expands each code
    // to {code} ∪ {code ⊕ bit}; joining probe = raw RIGHT code catches
    // every pair within Hamming distance 1 per table
    val probes = array((col("code") +: (0 until planes).map(i =>
      col("code").bitwiseXOR(lit(1L << i)))): _*)
    val expanded = inBuckets.select(col("id"), col("tbl"),
      explode(probes).as("probe"))

    val cand = expanded.alias("x").join(inBuckets.alias("y"),
        col("x.tbl") === col("y.tbl") && col("x.probe") === col("y.code") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

    cand
      .join(vecs.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na")), "a")
      .join(vecs.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(dotFixed(col("va"), col("vb"), dim) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF-style ANN: corpus is partitioned by nearest coarse centroid
    * (deterministically chosen seed vectors); queries probe the `nprobe`
    * nearest centroid lists. The 100 TB layout: cluster assignment is a
    * narrow map, per-list storage is partition-pruned at read time. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)

    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
      .repartition(col("nid"))
      .withColumn("cnorm", normFixed(col("cv"), DefaultDim))

    // deterministic coarse centroids: the nlist lowest-id vectors
    val cents = c.orderBy("nid").limit(nlist)
      .select(col("nid").as("cent_id"), col("cv").as("cent"), col("cnorm").as("centnorm"))

    // centroid similarity is ROUNDED to 6 dp before ranking: assignment then
    // never depends on sub-ulp summation differences, so an external oracle
    // (or a different cluster topology) reproduces identical lists
    val assigned = c.join(broadcast(cents), lit(true))
      .withColumn("csim", round(dotFixed(col("cv"), col("cent"), DefaultDim) /
        (col("cnorm") * col("centnorm")), 6))
      .withColumn("crank", row_number().over(
        Window.partitionBy("nid").orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("crank") === 1)
      .select(col("nid"), col("cv"), col("cnorm"), col("cent_id").as("list_id"))

    val qAssigned = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qnorm", normFixed(col("qv"), DefaultDim))
      .join(broadcast(cents), lit(true))
      .withColumn("csim", round(dotFixed(col("qv"), col("cent"), DefaultDim) /
        (col("qnorm") * col("centnorm")), 6))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qv"), col("qnorm"), col("cent_id").as("list_id"))

    val sims = assigned.join(qAssigned, Seq("list_id"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dotFixed(col("qv"), col("cv"), DefaultDim) /
              (col("qnorm") * col("cnorm")), 6).as("sim"))
      .distinct()

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "sim", "rank")
  }
}
