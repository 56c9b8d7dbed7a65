package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** Rehearsal for the APPLY side at production vocabulary sizes — the
  * encode twin of [[ProfileBpeTrain]] (r16 verdict ask #3): tokens/s
  * through `encodeIds` (per-partition word memo) and
  * `withTokenIdsColumn` (schema-preserving, no memo) at 50 / 1k / 8k /
  * 32k merges, plus the isolated driver-side `encodeWord` rate on
  * distinct words (Spark overhead subtracted). Two corpora:
  *
  *  - the real sf-dir corpus (tiny fixture vocabulary — the gate
  *    shape, saturates early);
  *  - a synthetic Zipf corpus drawn from ProfileBpeTrain's 30k-word
  *    histogram (what a production vocabulary actually encodes):
  *    deterministic log-uniform rank draws ≈ Zipf occurrence
  *    frequencies, so the memo sees realistic repeat rates.
  *
  * encodeWord is O(len² ) per word (a full adjacent-pair rescan per
  * applied merge) — the candidate cliff named in the r16 verdict; this
  * tool decides fix-or-not on numbers (DESIGN r17).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileBpeEncode
  */
object ProfileBpeEncode {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }

    // --- synthetic Zipf vocabulary (ProfileBpeTrain's histogram) ---
    val rnd = new java.util.Random(42L)
    val vocabWords: Array[String] = (1 to 30000).map { _ =>
      val len = 3 + rnd.nextInt(10)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.toArray
    val zipfHist: Array[(Array[String], Long)] = vocabWords.zipWithIndex
      .map { case (w, i) => (Bpe.symbolize(w), math.max(1L, 10000000L / (i + 1))) }

    // synthetic corpus: 20k docs x 256 words, log-uniform rank draws
    // (≈ Zipf-1 frequencies), deterministic per doc id
    val nDocs = 20000L
    val wordsPerDoc = 256
    val bcVocab = spark.sparkContext.broadcast(vocabWords)
    val corpus = spark.range(nDocs).select(col("id").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        val vw = bcVocab.value
        it.map { id =>
          val r = new java.util.Random(id * 2654435761L + 7L)
          val sb = new StringBuilder
          var j = 0
          while (j < wordsPerDoc) {
            val rank = math.min(vw.length - 1,
              math.pow(vw.length.toDouble, r.nextDouble()).toInt - 1)
            if (j > 0) sb.append(' ')
            sb.append(vw(math.max(0, rank)))
            j += 1
          }
          (id, sb.toString)
        }
      }
      .toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusTokens = corpus.count() * wordsPerDoc
    println(s"synthetic corpus: $nDocs docs x $wordsPerDoc words " +
      s"= $corpusTokens word occurrences, 30k distinct")

    def mergesDf(n: Int) = {
      val ms = Bpe.trainOnHistogram(
        zipfHist.map { case (s, c) => (s.clone(), c) }, n, 2)
      ms.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "left", "right")
    }

    println(f"${"numMerges"}%10s ${"encodeIds_s"}%12s ${"ids_tok/s"}%12s " +
      f"${"withCol_s"}%10s ${"col_tok/s"}%12s ${"encWord_us"}%11s")
    for (n <- Seq(50, 1000, 8000, 32000)) {
      val (m, _) = time(mergesDf(n))
      val v = Bpe.vocabularyFromWordCounts(
        corpus.select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .filter(col("word") =!= "").groupBy("word").agg(count(lit(1)).as("cnt")),
        m)
      // warm path A: encodeIds (memo) — total emitted ids forces full work
      val (nIdsA, tA) = time(
        Bpe.encodeIds(corpus, m, v)
          .agg(sum(size(col("token_ids")))).head().getLong(0))
      // path B: withTokenIdsColumn (no memo, per-occurrence encode)
      val (nIdsB, tB) = time(
        Bpe.withTokenIdsColumn(corpus, m, v, textCol = "text")
          .agg(sum(size(col("token_ids")))).head().getLong(0))
      assert(nIdsA == nIdsB, s"paths disagree: $nIdsA vs $nIdsB")
      // isolated driver-side encodeWord on the 30k DISTINCT words
      val ranks = m.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).zipWithIndex.toMap
      val (_, tW) = time(vocabWords.foreach(w => Bpe.encodeWord(w, ranks)))
      println(f"$n%10d $tA%12.2f ${corpusTokens / tA}%12.0f " +
        f"$tB%10.2f ${corpusTokens / tB}%12.0f " +
        f"${tW * 1e6 / vocabWords.length}%11.2f")
    }

    // the real sf-dir corpus at the gate's 50 merges, for reference
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (m50, v50) = Bpe.trainAndVocabulary(docs, numMerges = 50)
    val (nReal, tReal) = time(
      Bpe.encodeIds(docs, m50, v50)
        .agg(sum(size(col("token_ids")))).head().getLong(0))
    println(f"real $sfDir @50 merges: $nReal ids in $tReal%.2f s " +
      f"(${nReal / tReal}%.0f tok/s)")
    spark.stop()
  }
}
