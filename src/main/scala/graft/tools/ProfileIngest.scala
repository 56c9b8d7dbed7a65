package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, PipelineCaches, TextAnalysis}
import graft.streaming.StreamingOps

/** End-to-end rehearsal of the continuous-ingestion path at growing
  * corpus scale — the production pipeline measured as ONE composition,
  * not three gate entries:
  *
  *   normalize (corpus, once) → persisted MinHash signature artifact
  *   normalize (delta, per batch) → crossDedupFilter  (batch admission)
  *   streamingIngestVeto over the same artifact        (streaming twin)
  *
  * The claim under test is the 100×-shape envelope: a FIXED-SIZE delta
  * batch pays its own signatures plus band-bucket candidate probes, so
  * its admission latency must stay FLAT as the corpus behind the
  * artifact grows 1× → 10× (the corpus pays its signature work once, at
  * artifact build). Corpus copies are [[ScaleUp.scaledDocuments]] — each
  * copy a near-dup of copy 0 — so the candidate structure stays
  * realistic as the corpus grows. The delta is half near-duplicates of
  * corpus docs (must be vetoed) and half novel repeated-token docs (must
  * be admitted), both deterministic.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileIngest
  *        [factors]                (default factors: 1 2 5 10;
  *        SPARK_GRAFT_PROBE_ROUNDS=N, default 3)
  */
object ProfileIngest {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val probeRounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def norm(d: DataFrame): DataFrame =
      TextAnalysis.normalizeText(d)
        .select(col("doc_id"), col("norm_text").as("text"))

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_probe")
      .toString
    // fixed-size delta, independent of the corpus factor: near-dups of
    // copy-0 corpus docs (one extra token ⇒ jaccard ≥ 0.8, must be
    // vetoed) + novel docs whose shingles exist nowhere in the corpus
    // (must be admitted). Ids sit far past every corpus copy's stride.
    val nearDup = base.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + lit(99L * ScaleUp.Stride)).as("doc_id"),
        concat(col("text"), lit(" ingestdelta")).as("text"))
    val novel = base.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + lit(98L * ScaleUp.Stride)).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("novel"), col("doc_id"), lit("x"), i))).as("text"))
    val delta = nearDup.unionAll(novel).cache()
    val deltaRows = delta.count()
    val deltaLocal = delta.collect().map(r =>
      (r.getLong(0), new Timestamp(60000L), r.getString(1)))
    println(s"[ingest] delta batch: $deltaRows docs (fixed across factors)")

    for (f <- factors) {
      val corpusPath = s"$tmp/corpus_$f"
      ScaleUp.scaledDocuments(base, f)
        .write.mode(SaveMode.Overwrite).parquet(corpusPath)
      val corpus = spark.read.parquet(corpusPath)
      val nCorpus = corpus.count()
      // corpus-side setup, paid once per corpus version: normalize, then
      // build (or refresh) the persisted signature artifact
      val (tSetup, sigs) = t {
        val s = Dedup.minhashSignaturesPersisted(norm(corpus), s"$tmp/sig_$f")
        s.count(); s
      }
      println(f"[ingest] f=$f corpus=$nCorpus setup(normalize+sign+persist)=$tSetup%.2f s")
      for (round <- 1 to probeRounds) {
        // batch admission leg: normalize the delta, mine cross pairs
        // against the persisted signatures, admit the non-duplicates
        val (tBatch, admitted) = t {
          Dedup.crossDedupFilter(norm(delta), sigs).count()
        }
        PipelineCaches.clear(blocking = true)
        // streaming leg: the same delta as one micro-batch through the
        // stream-static veto against the same artifact (re-read: clear()
        // above released the probe caches)
        val sigs2 = Dedup.minhashSignaturesPersisted(norm(corpus), s"$tmp/sig_$f")
        val mem = MemoryStream[(Long, Timestamp, String)]
        mem.addData(deltaLocal.toIndexedSeq: _*)
        val qName = s"ingest_veto_${f}_$round"
        val (tStream, vetoed) = t {
          val q = StreamingOps.streamingIngestVeto(
              mem.toDF().toDF("doc_id", "ts", "text"), sigs2)
            .writeStream.format("memory").queryName(qName)
            .outputMode("append").start()
          try q.processAllAvailable() finally q.stop()
          spark.table(qName).count()
        }
        println(f"[ingest] f=$f r$round batch=$tBatch%.2f s admitted=$admitted" +
          f" stream=$tStream%.2f s vetoed=$vetoed")
        PipelineCaches.clear(blocking = true)
      }
    }
    spark.stop()
  }
}
