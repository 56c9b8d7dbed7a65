package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.pipeline.Similarity

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val df = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(2.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
  }

  test("graft_dot matches the HOF formulation bit-for-bit") {
    val got = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("native"),
      Similarity.dot(
        transform(col("a"), x => x.cast("double")),
        transform(col("b"), x => x.cast("double"))).as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got.head.getDouble(0) == 32.0)
  }

  test("graft_cosine: orthogonal=0, parallel=1") {
    val got = df.select(GraftFunctions.cosine(col("a"), col("b"))).collect()
    assert(got(1).getDouble(0) == 0.0)
    assert(got(2).getDouble(0) == 1.0)
  }

  test("registered for SQL text") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs ORDER BY d DESC LIMIT 1")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("null array yields null") {
    import spark.implicits._
    val d = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(d.select(GraftFunctions.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("graft_simhash: interpreted eval equals the independent xxhash64 reference") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val shingles = Seq("a b c", "b c d", "c d e", "the quick brown")
    // direct eval() — the non-codegen path; the DedupSpec equality test
    // covers the generated-code path
    val got = graft.functions.SimHash64(
      Literal.create(shingles, ArrayType(StringType))).eval(null)
    val hs = shingles.map(TestSpark.xxhash64Ref)
    val expected = (0 until 64).map { j =>
      val vote = hs.map(h => if ((h & (1L << j)) != 0) 1 else -1).sum
      if (vote > 0) 1L << j else 0L
    }.sum
    assert(got == expected)
  }

  test("graft_minhash aggregate: signature semantics match per-slot minima") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val d = Seq((1L, 100L), (1L, 200L), (2L, 100L)).toDF("id", "h")
    val sig = d.groupBy("id").agg(GraftFunctions.minhashSignatureAgg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).length == graft.pipeline.Dedup.NumHashes)
    assert(sig(2L).length == graft.pipeline.Dedup.NumHashes)
    // group 1 saw both inputs: each slot is the min of the two per-slot hashes
    // -> slot-wise <= group 2's single-input signature where inputs overlap
    sig(1L).zip(sig(2L)).foreach { case (a, b) => assert(a <= b || a != b) }
    // determinism across executions
    val sig2 = d.groupBy("id").agg(GraftFunctions.minhashSignatureAgg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig == sig2)
    // identical input sets -> identical signatures
    val d2 = Seq((7L, 200L), (7L, 100L)).toDF("id", "h")
    val sig7 = d2.groupBy("id").agg(GraftFunctions.minhashSignatureAgg(col("h")).as("sig"))
      .collect().head.getSeq[Long](1)
    assert(sig7 == sig(1L))
  }

  test("graft_minhash_row is bit-identical to the grouped aggregate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val groups = Seq(
      1L -> Seq(100L, 200L, -5L), 2L -> Seq(100L), 3L -> Seq.empty[Long])
    val agg = groups.flatMap { case (id, hs) => hs.map(id -> _) }
      .toDF("id", "h").groupBy("id")
      .agg(GraftFunctions.minhashSignatureAgg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val row = groups.toDF("id", "hs")
      .select(col("id"), GraftFunctions.minhashSignatureRow(col("hs")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(row(1L) == agg(1L) && row(2L) == agg(2L))
    // empty shingle set -> untouched buffer (all Long.MaxValue), matching
    // what the aggregate would produce for an empty group
    assert(row(3L).forall(_ == Long.MaxValue))
    assert(row(1L).length == graft.pipeline.Dedup.NumHashes)
  }

  test("graft_kmv: unsigned k-minima, dedup, shuffle-merge, estimator accuracy") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val n = 20000
    val df = spark.range(n).select(xxhash64(col("id")).as("h"))
    def minsOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(GraftFunctions.kmvAgg(col("h"), 256).as("m"))
        .collect()(0).getSeq[Long](0)
    val mins = minsOf(df.repartition(8)) // partial+merge across partitions
    val exact = df.collect().map(_.getLong(0)).distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(256)
    assert(mins == exact.toSeq)
    // duplicates never inflate the sketch
    assert(minsOf(df.union(df).repartition(7)) == mins)
    // the estimator lands near the true distinct count (se ~ 1/sqrt(k-2))
    val u = mins.last
    val ud = u.toDouble + (if (u < 0) 1.8446744073709552E19 else 0.0)
    val est = 255.0 * 1.8446744073709552E19 / ud
    assert(math.abs(est - n) / n < 0.25, s"est=$est vs $n")
    // under-k group: all values, unsigned order (-1L sorts LAST)
    val small = Seq(5L, -1L, 3L, 5L).toDF("h")
      .agg(GraftFunctions.kmvAgg(col("h"), 256).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(small == Seq(3L, 5L, -1L))
  }

  test("graft_cms: counters equal per-bucket group-by, estimates bound truth") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val d = 2; val w = 16
    // 500 keys, zipf-ish multiplicities; buckets from the key's low bits
    // of two seeded hashes
    def bucket(r: Int, k: org.apache.spark.sql.Column) =
      pmod(xxhash64(concat(lit(s"s$r-"), k.cast("string"))), lit(w.toLong)).cast("int")
    val keys = spark.range(500)
      .select((col("id") % 40).as("k"))
      .repartition(8)
    val cms = keys.agg(GraftFunctions.cmsAgg(
        array(bucket(0, col("k")), bucket(1, col("k"))), d, w).as("m"))
      .collect()(0).getSeq[Long](0)
    // rebuild counters naively
    val rows = keys.select(col("k"), bucket(0, col("k")).as("b0"),
        bucket(1, col("k")).as("b1")).collect()
    val expect = new Array[Long](d * w)
    rows.foreach { r => expect(r.getInt(1)) += 1; expect(w + r.getInt(2)) += 1 }
    assert(cms == expect.toSeq)
    // point estimates are always >= truth
    val truth = rows.groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
    truth.foreach { case (k, n) =>
      val r0 = rows.find(_.getLong(0) == k).get
      val est = math.min(cms(r0.getInt(1)), cms(w + r0.getInt(2)))
      assert(est >= n, s"key $k: est $est < true $n")
    }
  }

  test("graft_bitmap_neighbors equals sorted collect_set, incl. shuffle-merge path") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // enough rows across partitions to force serialize/deserialize + merge;
    // duplicate edges must dedup; skewed key 0 gets a big neighbor set
    val edges = spark.range(0, 5000)
      .select((col("id") % 50).as("src"), (col("id") % 997).as("dst"))
      .union(spark.range(0, 2000).select(lit(0L).as("src"), (col("id") * 3).as("dst")))
      .repartition(8)
    val bitmap = edges.groupBy("src")
      .agg(GraftFunctions.bitmapNeighborsAgg(col("dst")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val reference = edges.groupBy("src")
      .agg(array_sort(collect_set(col("dst"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bitmap.keySet == reference.keySet)
    bitmap.foreach { case (k, n) =>
      assert(n == reference(k), s"neighbor set mismatch for key $k")
      assert(n == n.sorted, s"bitmap output not ascending for key $k")
    }
  }

  test("adjacency index built through the bitmap aggregate reads identically") {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("btab", Seq(1L, 2L, 3L).toDF("id"))
    g.registerNode("BN", "btab", "id")
    g.registerTable("BE", Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 2L))
      .toDF("from_BN", "to_BN"))
    g.registerRel("BE", "BE", "BN", "BN", adjIndex = true)
    val out = g.adjIndex("BE", outgoing = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out == Map(1L -> Seq(2L, 3L), 2L -> Seq(3L)))
  }

  test("graft_srp_codes equals the composed array(srpCode x L) form bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(99)
    val dim = 64
    val vecs = Seq.fill(200)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val tables = 13; val planes = 9
    val composed = array((0 until tables).map(t =>
      Similarity.srpCode(
        transform(col("v"), x => x.cast("double")), planes, dim,
        seed = 7L + t * 1000L)): _*)
    val got = vecs.select(col("id"),
        GraftFunctions.srpCodes(col("v"), tables, planes, dim).as("fused"),
        composed.as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"mismatch for id ${r.getLong(0)}")
    }
    // interpreted eval agrees with the codegen'd DataFrame path: run the
    // expression directly over one of the same vectors
    val sample = vecs.select(col("id"), col("v")).collect().head
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      sample.getSeq[Float](1),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interp = graft.functions.SrpCodesExpr(lit0, tables, planes, dim, 7L)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    val fusedForSample = got.find(_.getLong(0) == sample.getLong(0)).get.getSeq[Long](1)
    assert(interp == fusedForSample)
  }

  test("CentroidSimsExpr equals the literal struct-array form bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val dim = 64
    val vecs = Seq.fill(300)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("v"), col("v"))))
    val cents = Seq.tabulate(17) { c =>
      (c.toLong * 3, Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    }.map { case (id, cent) =>
      (id, cent, math.sqrt(cent.map(x => x * x).sum))
    }
    // the replaced formulation: literal arrays + Spark round()
    val literalForm = array(cents.map { case (id, cent, nrm) =>
      struct(
        round(GraftFunctions.dot(col("v"), lit(cent)) / (col("nrm") * lit(nrm)), 6)
          .as("csim"),
        lit(-id).as("negid"))
    }: _*)
    val fused = GraftFunctions.centroidSims(col("v"), col("nrm"),
      cents.map(_._1).toArray, cents.flatMap(_._2.toSeq).toArray,
      cents.map(_._3).toArray, dim)
    val rows = vecs.select(col("id"), fused.as("f"), literalForm.as("l")).collect()
    rows.foreach { r =>
      val f = r.getSeq[org.apache.spark.sql.Row](1)
      val l = r.getSeq[org.apache.spark.sql.Row](2)
      assert(f.size == l.size)
      f.zip(l).foreach { case (a, b) =>
        // bit-for-bit: compare raw double bits, not ==
        assert(java.lang.Double.doubleToLongBits(a.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(0)),
          s"csim mismatch id=${r.getLong(0)}: ${a.getDouble(0)} vs ${b.getDouble(0)}")
        assert(a.getLong(1) == b.getLong(1))
      }
    }
  }

  test("PqEncodeExpr equals the per-subspace literal argmin form bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val m = 4; val kCent = 8; val dSub = 4
    val cb = IndexedSeq.fill(m)(IndexedSeq.fill(kCent)(
      IndexedSeq.fill(dSub)(rnd.nextDouble() - 0.5)))
    val vecs = Seq.fill(200)(Array.fill(m * dSub)(rnd.nextDouble() - 0.5))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    // the replaced formulation: unrolled literal distances + first-min
    // position per subspace
    val literalForm = array((0 until m).map { mi =>
      val dists = array((0 until kCent).map { ki =>
        (0 until dSub).map { d =>
          val diff = element_at(col("v"), mi * dSub + d + 1) - lit(cb(mi)(ki)(d))
          diff * diff
        }.reduceLeft(_ + _)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    val fused = GraftFunctions.pqEncode(col("v"),
      cb.flatten.flatten.toArray, m, kCent, dSub)
    val rows = vecs.select(col("id"), fused.as("f"), literalForm.as("l")).collect()
    rows.foreach(r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"codes mismatch id=${r.getLong(0)}"))
    // float input path: same codes from the float-typed fixture column
    val fv = vecs.withColumn("vf", col("v").cast("array<float>"))
    val both = fv.select(
      GraftFunctions.pqEncode(col("vf"), cb.flatten.flatten.toArray, m, kCent, dSub).as("a"),
      GraftFunctions.pqEncode(col("v").cast("array<float>").cast("array<double>"),
        cb.flatten.flatten.toArray, m, kCent, dSub).as("b")).collect()
    both.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("usable from Cypher through the function registry") {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("vtab", Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 4.0f))).toDF("id", "v"))
    g.registerNode("Vec", "vtab", "id")
    val out = g.cypher(
      "MATCH (v:Vec) RETURN v.id AS id, round(cosine_similarity(v.v, v.v), 4) AS c;")
    assert(out.collect().map(_.getDouble(1)).toSet == Set(1.0))
  }
}
