package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

/** Pins the BPE trainer against merges derived BY HAND on the canonical
  * Sennrich et al. corpus {low×5, lower×2, newest×6, widest×3} — ground
  * truth computed on paper, not by re-running the implementation. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  private def corpusDf = {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((0L, text)).toDF("doc_id", "text")
  }

  test("train: hand-derived merge sequence, deterministic tie-breaks") {
    val merges = Bpe.train(corpusDf, numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1: (e,s)=9 ties (s,t)=9 and (t,</w>)=9 — lex smallest wins;
    // rounds 4/6/7/10 are the other hand-checked tie-breaks
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"), ("low", "</w>"),
      ("d", "est</w>")))
  }

  test("train: stops when no pair reaches minPairCount") {
    // every word unique => after enough merges the best pair count is 1
    import spark.implicits._
    val df = Seq((0L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.train(df, numMerges = 50)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(merges.isEmpty) // all pairs occur once < minPairCount=2
  }

  test("encodeWord: learned subwords compose on unseen words") {
    val ranks = Bpe.train(corpusDf, numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).zipWithIndex.toMap
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("newest</w>"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low</w>"))
    // unseen word splits into the learned subwords, not characters
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est</w>"))
    // wholly out-of-vocabulary characters stay as characters
    assert(Bpe.encodeWord("xyz", ranks).toSeq ==
      Seq("x", "y", "z", "</w>"))
  }

  test("tokenCounts: distributed apply matches per-word encoding") {
    import spark.implicits._
    val merges = Bpe.train(corpusDf, numMerges = 10)
    val docs = Seq((1L, "low lowest newest"), (2L, "widest widest"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // low→1 (low</w>), lowest→2 (low + est</w>), newest→1 ⇒ 4 BPE tokens
    assert(got(1L) == ((3L, 4L)))
    // widest→2 (w i d est</w> → after (d,est</w>): w i dest</w> ... by
    // hand: merges applied in rank order: (d,est</w>) rank 9 ⇒
    // [w, i, dest</w>] and no (w,i)/(i,dest</w>) merges exist ⇒ 3 each
    assert(got(2L) == ((2L, 6L)))
  }

  test("withTokenCountColumn: schema-preserving column matches tokenCounts") {
    import spark.implicits._
    val merges = Bpe.train(corpusDf, numMerges = 10)
    val docs = Seq((1L, "low lowest newest", "x"), (2L, "widest widest", "y"),
        (3L, "", "z"))
      .toDF("doc_id", "text", "extra")
    val got = Bpe.withTokenCountColumn(docs, merges, textCol = "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3))))
      .toMap
    // same counts as the tokenCounts spec above, other columns intact
    assert(got(1L) == (("x", 4L)))
    assert(got(2L) == (("y", 6L)))
    assert(got(3L) == (("z", 0L))) // empty text counts 0, row survives
    // multi-line content: newline is whitespace to the word splitter
    val ml = Seq((9L, "low\nlowest")).toDF("doc_id", "c")
    assert(Bpe.withTokenCountColumn(ml, merges, textCol = "c")
      .collect().head.getLong(2) == 3L)
  }

  test("trainPersistedIfStale: artifact serves, staleness-fence retrains") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_t").toString
    try {
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val fresh = m(Bpe.train(corpusDf, numMerges = 10))
      // first call builds; the artifact equals the fresh train
      assert(m(Bpe.trainPersistedIfStale(corpusDf, dir, numMerges = 10))
        == fresh)
      // second call serves the artifact (same rows, meta unchanged)
      val metaBefore = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/_bpe_meta.json")), "UTF-8")
      assert(m(Bpe.trainPersistedIfStale(corpusDf, dir, numMerges = 10))
        == fresh)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/_bpe_meta.json")), "UTF-8")
        == metaBefore)
      // parameter fence: a different merge count must retrain, not serve
      val ten = fresh.size
      assert(m(Bpe.trainPersistedIfStale(corpusDf, dir, numMerges = 5)).size
        < ten)
      // corpus fence: a changed corpus must retrain
      val grown = corpusDf.unionAll(
        Seq((99L, "zz zz zz zz zz zz zz zz")).toDF("doc_id", "text"))
      assert(m(Bpe.trainPersistedIfStale(grown, dir, numMerges = 10))
        == m(Bpe.train(grown, numMerges = 10)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
