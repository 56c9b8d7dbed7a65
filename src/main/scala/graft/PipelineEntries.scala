package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.TpchGraph
import graft.graph.GraphAlgorithms
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingOps

/** Training-data pipeline operators surfaced as driver-checkable queries.
  * Entries without an `oracleSql` mirror (hash-based / heuristic ops) get
  * the driver's rows-only check and are additionally covered by ScalaTest
  * specs with self-computed ground truth.
  */
object PipelineEntries {

  private def docs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String) = s.read.parquet(s"$dir/embeddings.parquet")
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default; read nanos as long and convert to a microsecond
    * timestamp (integer DIV — floor, matching DuckDB's cast-to-µs). */
  private def events(s: SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: canonical min-id + duplicate count per identical text
    "p_dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    // MinHash+LSH near-dup pairs (banded candidate join, exact-verify)
    "p_dedup_minhash" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir), threshold = 0.8)),

    // SimHash near-dup pairs (chunk-blocked Hamming)
    "p_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxHamming = 6)),

    // exact n-gram Jaccard within (lang, length) blocks — oracle-checked
    "p_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), threshold = 0.5)),

    // brute-force cosine top-5 for queries vec_id % 50 == 0 — oracle-checked
    "p_embed_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(pmod(col("vec_id"), lit(50)) === 0), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // hyperplane-LSH ANN over the same query set (scale path; recall vs
    // brute force asserted in SimilaritySpec)
    "p_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, e.filter(pmod(col("vec_id"), lit(50)) === 0), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF-style ANN (coarse quantizer + nprobe lists)
    "p_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e, e.filter(pmod(col("vec_id"), lit(50)) === 0), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // quality scoring — oracle-checked
    "p_text_quality" -> ((s, dir) => TextAnalysis.qualityFeatures(docs(s, dir))),

    // whitespace + BPE-ish token counts — oracle-checked
    "p_token_count" -> ((s, dir) => TextAnalysis.tokenCounts(docs(s, dir))),

    // language-ID heuristic (marker lexicons + CJK ratio)
    "p_lang_id" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),

    // winnowing fingerprints (rolling min-hash sketch)
    "p_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(docs(s, dir))),

    // multimodal: binary column → batched stub decode — oracle-checked
    "p_multimodal" -> ((s, dir) =>
      Multimodal.extractFeatures(s, Multimodal.attachBinary(docs(s, dir)))),

    // tumbling-window agg (batch form of the streaming op) — oracle-checked
    "p_window" -> ((s, dir) => StreamingOps.tumblingCounts(events(s, dir))),

    // gap-based sessionization — oracle-checked
    "p_sessionize" -> ((s, dir) => StreamingOps.sessionize(events(s, dir))),

    // composite curation pipeline: exact-dedup -> quality gate -> per-lang
    // corpus stats (operators composing end-to-end) — oracle-checked.
    // The gate uses the UNROUNDED score with a threshold nudged off the
    // representable boundary: a 4-dp-rounded gate at exactly 0.5 flipped one
    // boundary doc between Spark and DuckDB in round 1.
    "p_curate" -> ((s, dir) => {
      val d = docs(s, dir)
      val keep = Dedup.exact(d).select("doc_id")
      val quality = TextAnalysis.qualityFeaturesRaw(d).select("doc_id", "n_tokens", "score")
      d.join(keep, "doc_id")
        .join(quality, "doc_id")
        .filter(col("score") >= 0.5 - 1e-9)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
    }),

    // GraphX connected components over the same-label NATION_ADJ edge
    // list; component id = min member id ⇒ SQL-oracle-checkable
    "g_concomp" -> ((s, dir) =>
      GraphAlgorithms.connectedComponents(TpchGraph.session(s, dir), "NATION_ADJ")),

    // GraphX static PageRank (fixed 10 iterations; rows-only check,
    // properties asserted in GraphSpec)
    "g_pagerank" -> ((s, dir) =>
      GraphAlgorithms.pageRank(TpchGraph.session(s, dir), "NATION_ADJ")),

    // degree distribution from the edge list — oracle-checked
    "g_degrees" -> ((s, dir) =>
      GraphAlgorithms.degrees(TpchGraph.session(s, dir), "NATION_ADJ")),
  )

  def oracleSql: Map[String, String] = Map(
    "p_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt FROM documents GROUP BY text",

    "p_dedup_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars / 100) AS BIGINT) AS blk,
        |         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
        |  FROM (SELECT doc_id, lang, n_chars,
        |               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents))
        |SELECT a, b, jaccard FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |         round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |               (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4) AS jaccard
        |  FROM t x JOIN t y
        |    ON x.lang = y.lang AND x.blk = y.blk AND x.doc_id < y.doc_id)
        |WHERE jaccard >= 0.5""".stripMargin,

    "p_embed_topk" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 50 = 0),
        |s AS (
        |  SELECT qid, n.vec_id AS nid,
        |         round(list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])) /
        |               (qnrm * nrm), 6) AS sim
        |  FROM q, n WHERE n.vec_id <> q.qid)
        |SELECT qid, nid, sim, rank FROM (
        |  SELECT qid, nid, sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        |  FROM s)
        |WHERE rank <= 5""".stripMargin,

    "p_text_quality" ->
      """SELECT doc_id, n_tokens, punct_cnt, stop_cnt,
        |       round(least(n_tokens, 100) / 100.0 * 0.5 +
        |             CAST(stop_cnt AS DOUBLE) / n_tokens * 0.3 +
        |             (1.0 - least(punct_cnt, 20) / 20.0) * 0.2, 4) AS score
        |FROM (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS punct_cnt,
        |         CAST(len(list_filter(toks, t -> list_contains(
        |           ['the','a','an','of','and','to','in','is','it','that'], t))) AS BIGINT) AS stop_cnt,
        |         text
        |  FROM (SELECT doc_id, text,
        |               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents))""".stripMargin,

    "p_token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS sub_tokens
        |FROM documents""".stripMargin,

    "p_multimodal" ->
      """SELECT doc_id, n_bytes,
        |       64 + n_bytes % 640 AS width,
        |       64 + (n_bytes * 7) % 480 AS height,
        |       'fake/raw' AS format
        |FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |      FROM documents)""".stripMargin,

    "p_window" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS window_start,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "p_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "p_curate" ->
      """WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |q AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         least(len(toks), 100) / 100.0 * 0.5 +
        |           CAST(len(list_filter(toks, t -> list_contains(
        |             ['the','a','an','of','and','to','in','is','it','that'], t))) AS DOUBLE)
        |             / len(toks) * 0.3 +
        |           (1.0 - least(length(text) -
        |             length(regexp_replace(text, '[[:punct:]]', '', 'g')), 20) / 20.0) * 0.2
        |           AS score
        |  FROM (SELECT doc_id, text,
        |               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents))
        |SELECT d.lang, count(*) AS n_docs, sum(q.n_tokens) AS total_tokens
        |FROM documents d
        |JOIN keep k ON k.doc_id = d.doc_id
        |JOIN q ON q.doc_id = d.doc_id
        |WHERE q.score >= 0.4999999990
        |GROUP BY d.lang""".stripMargin,

    "g_concomp" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |       CAST(MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS component
        |FROM nation""".stripMargin,

    "g_degrees" ->
      """WITH e AS (
        |  SELECT n1.n_nationkey AS f, n2.n_nationkey AS t
        |  FROM nation n1 JOIN nation n2
        |    ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey),
        |o AS (SELECT CAST(f AS BIGINT) AS id, count(*) AS out_degree FROM e GROUP BY 1),
        |i AS (SELECT CAST(t AS BIGINT) AS id, count(*) AS in_degree FROM e GROUP BY 1)
        |SELECT COALESCE(o.id, i.id) AS id,
        |       COALESCE(out_degree, 0) AS out_degree,
        |       COALESCE(in_degree, 0) AS in_degree
        |FROM o FULL OUTER JOIN i ON o.id = i.id""".stripMargin,
  )
}
