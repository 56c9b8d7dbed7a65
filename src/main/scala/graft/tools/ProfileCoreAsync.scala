package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rehearsal probe for partition-local MULTI-STEP h-index refinement in
  * [[graft.graph.GraphAlgorithms.coreNumbers]] (the r14 verdict's "probe
  * the depth term once, then stop" ask).
  *
  * Montresor 2011's operator tolerates asynchrony: applying
  * c(v) ← min(c(v), H{c(u)}) with ANY mix of fresh and stale neighbor
  * values still converges to the coreness from above. So a distributed
  * round COULD iterate to a local fixpoint INSIDE each partition
  * (Gauss-Seidel over intra-partition edges) before synchronizing, and
  * a cascade that travels within one partition would collapse many
  * global rounds into one. Whether that wins depends entirely on edge
  * LOCALITY under the production HashPartitioner: a cascade hop leaves
  * the partition with probability ≈ (1 − intraFraction), and each exit
  * costs a global round regardless of local iteration.
  *
  * This probe measures the answer EXACTLY, driver-side, on the real
  * cascade graph (the collided-keyspace PLACED canonical edge set —
  * the 273-round sf0.1 probe): it simulates (a) the production
  * synchronous (Jacobi) rounds and (b) the partition-local-to-fixpoint
  * (block Gauss-Seidel) rounds under the same HashPartitioner, and
  * reports both round counts plus the intra-partition edge fraction.
  * Both simulations verify against each other (same fixpoint). The
  * driver sim is exact for round counts — rounds are a property of the
  * update schedule, not the execution substrate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileCoreAsync
  *        [maxK] [parts]   (defaults 64 and the production parts rule)
  */
object ProfileCoreAsync {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gs = graft.fixtures.TpchGraph.session(spark, sfDir)
    val maxK = args.headOption.map(_.toInt).getOrElse(64)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(
      math.max(spark.sparkContext.defaultParallelism / 2, 4))

    // the exact canonical edge set coreNumbers(gs, "PLACED") iterates on
    val r = gs.catalog.rel("PLACED")
    val canon = gs.table(r.tableName)
      .select(col(r.fromColumn).cast("long").as("a"),
        col(r.toColumn).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct()
      .collect().map(rw => (rw.getLong(0), rw.getLong(1)))
    val verts = (canon.map(_._1) ++ canon.map(_._2)).distinct.sorted
    val idx = verts.zipWithIndex.toMap
    val n = verts.length
    println(s"[core-async] $sfDir PLACED: |V|=$n |E|=${canon.length} " +
      s"maxK=$maxK parts=$parts")

    // CSR adjacency
    val deg = new Array[Int](n)
    canon.foreach { case (a, b) => deg(idx(a)) += 1; deg(idx(b)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](off(n))
    val fill = java.util.Arrays.copyOf(off, n)
    canon.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      adj(fill(ia)) = ib; fill(ia) += 1
      adj(fill(ib)) = ia; fill(ib) += 1
    }
    // production partitioner: HashPartitioner on the raw vertex id
    val pOf = verts.map(v =>
      java.lang.Math.floorMod(v.hashCode, parts)).toArray
    var intra = 0L
    canon.foreach { case (a, b) =>
      if (pOf(idx(a)) == pOf(idx(b))) intra += 1 }
    println(f"[core-async] intra-partition edge fraction: " +
      f"${intra.toDouble / canon.length}%.4f (random expectation ~ " +
      f"${1.0 / parts}%.4f)")

    def hIndex(vals: Array[Int], v: Int): Int = {
      // h-index of neighbor values capped at maxK: one counting pass
      val hist = new Array[Int](maxK + 1)
      var j = off(v)
      while (j < off(v + 1)) {
        val c = vals(adj(j)); hist(if (c > maxK) maxK else c) += 1; j += 1
      }
      var s = 0; var t = maxK
      while (t >= 1) { s += hist(t); if (s >= t) return t; t -= 1 }
      0
    }
    // partition-aware variant: fresh values for in-partition neighbors,
    // the round-start snapshot for external ones — what each partition
    // of a PARALLEL block-Gauss-Seidel round actually sees (reading
    // other partitions' same-round updates would overstate the collapse:
    // partitions run concurrently, not in sequence)
    def hIndexMixed(fresh: Array[Int], snap: Array[Int], pOfv: Array[Int],
        p: Int, v: Int): Int = {
      val hist = new Array[Int](maxK + 1)
      var j = off(v)
      while (j < off(v + 1)) {
        val w = adj(j)
        val c = if (pOfv(w) == p) fresh(w) else snap(w)
        hist(if (c > maxK) maxK else c) += 1; j += 1
      }
      var s = 0; var t = maxK
      while (t >= 1) { s += hist(t); if (s >= t) return t; t -= 1 }
      0
    }
    def init(): Array[Int] =
      Array.tabulate(n)(v => math.min(off(v + 1) - off(v), maxK))

    // (a) synchronous Jacobi rounds — the production schedule
    def simSync(): (Array[Int], Int) = {
      var vals = init()
      var rounds = 0
      var changed = true
      while (changed) {
        changed = false
        val next = java.util.Arrays.copyOf(vals, n)
        var v = 0
        while (v < n) {
          val h = hIndex(vals, v)
          if (h < next(v)) { next(v) = h; changed = true }
          v += 1
        }
        vals = next
        if (changed) rounds += 1
      }
      (vals, rounds)
    }

    // (b) block Gauss-Seidel: each global round runs every partition to
    // its LOCAL fixpoint (fresh values for in-partition neighbors, the
    // round-start snapshot for external ones), then synchronizes.
    // A worklist keeps the local iteration O(touched), as a real
    // zipPartitions implementation would.
    def simAsync(): (Array[Int], Int) = {
      val vals = init()
      var rounds = 0
      var changed = true
      while (changed) {
        changed = false
        val snap = java.util.Arrays.copyOf(vals, n)
        var p = 0
        while (p < parts) {
          // seed: all vertices of the partition (a real impl seeds with
          // the incoming frontier; rounds are identical either way —
          // extra seeds just recompute an unchanged h)
          val queue = new java.util.ArrayDeque[Int]()
          val queued = new Array[Boolean](n)
          var v = 0
          while (v < n) {
            if (pOf(v) == p) { queue.add(v); queued(v) = true }
            v += 1
          }
          while (!queue.isEmpty) {
            val u = queue.poll(); queued(u) = false
            val h = hIndexMixed(vals, snap, pOf, p, u)
            if (h < vals(u)) {
              vals(u) = h; changed = true
              var j = off(u)
              while (j < off(u + 1)) {
                val w = adj(j)
                if (pOf(w) == p && !queued(w)) { queue.add(w); queued(w) = true }
                j += 1
              }
            }
          }
          p += 1
        }
        if (changed) rounds += 1
      }
      (vals, rounds)
    }

    val t0 = System.nanoTime()
    val (syncVals, syncRounds) = simSync()
    val t1 = System.nanoTime()
    val (asyncVals, asyncRounds) = simAsync()
    val t2 = System.nanoTime()
    require(java.util.Arrays.equals(syncVals, asyncVals),
      "sync and async fixpoints differ — simulation bug")
    val coreHist = syncVals.groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy(_._1).takeRight(5)
    println(s"[core-async] fixpoint identical; top coreness buckets: " +
      coreHist.map { case (k, c) => s"$k:$c" }.mkString(" "))
    println(f"[core-async] sync (production Jacobi) rounds: $syncRounds " +
      f"(sim ${(t1 - t0) / 1e9}%.1f s)")
    println(f"[core-async] partition-local-to-fixpoint rounds: $asyncRounds " +
      f"(sim ${(t2 - t1) / 1e9}%.1f s)")
    println(f"[core-async] round collapse: ${syncRounds.toDouble / asyncRounds}%.2fx")

    // counterfactual: LOCALITY-AWARE (range) partitioning — contiguous
    // sorted-id blocks instead of the production hash. If even the best
    // plausible layout can't collapse the cascade, the multi-step idea
    // is dead on this graph, not just mis-partitioned.
    val rangeOf = Array.tabulate(n)(v => (v.toLong * parts / n).toInt)
    var intraR = 0L
    canon.foreach { case (a, b) =>
      if (rangeOf(idx(a)) == rangeOf(idx(b))) intraR += 1 }
    val saveHash = pOf.clone()
    System.arraycopy(rangeOf, 0, pOf, 0, n)
    val (rangeVals, rangeRounds) = simAsync()
    System.arraycopy(saveHash, 0, pOf, 0, n)
    require(java.util.Arrays.equals(syncVals, rangeVals),
      "range-partitioned fixpoint differs — simulation bug")
    println(f"[core-async] RANGE partitioning: intra fraction " +
      f"${intraR.toDouble / canon.length}%.4f, " +
      f"partition-local rounds: $rangeRounds " +
      f"(collapse ${syncRounds.toDouble / rangeRounds}%.2fx)")
    spark.stop()
  }
}
