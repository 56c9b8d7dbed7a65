package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PrefixSum

/** Direct pins for the shared distributed-prefix-sum substrate all three
  * cumulative operators ride (packSequences, packConversations,
  * seededShuffle) — the consumers' specs check their own semantics; this
  * one checks the substrate against the naive window formulation on
  * adversarial random data, so a substrate bug can't hide behind a
  * consumer whose fixture happens not to trigger it. */
class PrefixSumSpec extends AnyFunSuite {
  import TestSpark._

  test("grouped running sum equals the naive per-group window on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 500 rows, 7 groups (some empty-ish, one dominant), values incl. 0;
    // ids unique — the substrate's uniqueness contract
    val rnd = new scala.util.Random(97)
    val rows = (0L until 500L).map { id =>
      val g = if (rnd.nextInt(10) < 4) 0L else rnd.nextInt(7).toLong
      (id, g, rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("id", "g", "v")
    val got = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val naive = df.withColumn("cum",
        sum("v").over(Window.partitionBy("g").orderBy("id")))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == naive)
    graft.pipeline.PipelineCaches.clear()
  }

  test("composite order columns: lexicographic (b, id) order, ties on b") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(31)
    // heavy ties on b force the secondary key to matter
    val rows = (0L until 300L).map { id =>
      (id, rnd.nextInt(3).toLong, rnd.nextInt(5).toLong, 1L)
    }
    val df = rows.toDF("id", "g", "b", "one")
    val got = PrefixSum.groupedRunningSum(df, "g", Seq("b", "id"), "one", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    val naive = df.withColumn("rk",
        sum("one").over(Window.partitionBy("g").orderBy("b", "id")))
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(got == naive)
    graft.pipeline.PipelineCaches.clear()
  }

  test("loud contract failures: non-integral types and null groups") {
    import spark.implicits._
    val bad = Seq((1L, "a", 2L)).toDF("id", "g", "v")
    val e1 = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(bad, "g", "id", "v", "cum")
    }
    assert(e1.getMessage.contains("integral"))
    val badV = Seq((1L, 2L, 0.5)).toDF("id", "g", "v")
    val e2 = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(badV, "g", "id", "v", "cum")
    }
    assert(e2.getMessage.contains("integral"))
    val nullG = Seq((1L, Some(2L), 3L), (2L, None, 4L))
      .toDF("id", "g", "v")
    val e3 = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(nullG, "g", "id", "v", "cum")
    }
    assert(e3.getMessage.contains("null"))
    graft.pipeline.PipelineCaches.clear()
  }
}
