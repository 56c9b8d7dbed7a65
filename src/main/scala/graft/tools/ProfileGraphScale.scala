package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-evidence probe for the DataFrame graph algorithms on an edge
  * list that actually GROWS with the scale factor. The gate queries run
  * label propagation / link features over NATION_ADJ, whose vertex set is
  * a TPC-H dimension — ScaleUp keeps dimensions fixed, so sf1 timings of
  * those queries say nothing about edge-count scaling. This probe runs
  * the same operators over the PLACED edge list (|E| = |orders|, 10× per
  * factor) so DESIGN.md can report a real curve.
  *
  * GRAPH SHAPE CAVEAT (round 12): PLACED keeps raw o_custkey/o_orderkey,
  * whose key spaces COLLIDE numerically — operators that canonicalize to
  * an undirected vertex space (kCore, coreNumbers, louvain, the walks)
  * see NOT a clean bipartite graph but a tangle with long chains, and
  * BFS/peel/refinement depth GROWS with sf (measured coreness cascade:
  * 53 rounds at sf0.01 → 273 at sf0.1). That makes this an adversarial
  * high-diameter probe — per-op comments below describing bipartite
  * behavior hold for the directed view only. Round-heavy numbers here
  * are depth-dominated, not |E|-dominated; real-world graphs keep depth
  * roughly constant as they grow.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileGraphScale
  *        [op-name substrings]   (SPARK_GRAFT_PROBE_ROUNDS=N, default 3)
  */
object ProfileGraphScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gs = graft.fixtures.TpchGraph.session(spark, sfDir)
    // optional op-name filter (substring match on the label), so a single
    // slow operator can be probed in isolation without re-running the rest
    val only: Set[String] = args.toSet
    val probeRounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    def time[A](label: String)(f: => A): Option[A] =
      if (only.nonEmpty && !only.exists(label.contains)) None
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        Some(r)
      }
    for (round <- 1 to probeRounds) {
      time(s"r$round labelprop(PLACED, 5)") {
        graft.graph.GraphAlgorithms.labelPropagation(gs, "PLACED", iters = 5)
          .count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // bipartite customer–order graph: wedge volume = Σ_c deg(c)² grows
      // linearly with the customer count (per-customer order counts are
      // scale-invariant), so this exercises the wedge join at 10×
      time(s"r$round linkFeatures(PLACED)") {
        graft.graph.GraphAlgorithms.linkFeatures(gs, "PLACED").count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // bipartite 2-core: every order has degree 1, so the first round
      // peels ALL orders and the second empties the customers — two
      // full-|E| peel rounds + the convergence round, the worst case for
      // the per-round rebase cost
      time(s"r$round kCore(PLACED, 2)") {
        graft.graph.GraphAlgorithms.kCore(gs, "PLACED", k = 2).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      time(s"r$round hits(PLACED, 5)") {
        graft.graph.GraphAlgorithms.hits(gs, "PLACED", iters = 5).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // walks stop at order sinks after one step; the measured cost is
      // the ranked-adjacency build (row_number over |E|) + one frontier
      // join per surviving step
      time(s"r$round randomWalks(PLACED, 4)") {
        graft.graph.GraphAlgorithms.randomWalks(gs, "PLACED").count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // PPR from 3 customer sources over the bipartite graph: rank mass
      // dies at order sinks, so this measures |E|-proportional round cost
      time(s"r$round personalizedPageRank(PLACED, 10)") {
        graft.graph.GraphAlgorithms.personalizedPageRank(gs, "PLACED",
          sourceIds = Seq(1L, 2L, 3L), iters = 10).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // modularity of the trivial per-customer assignment: exercises the
      // two label joins + aggregates at |E| scale
      time(s"r$round modularity(PLACED)") {
        val comm = gs.table("PLACED")
          .select(org.apache.spark.sql.functions.col("from_Customer")
            .as("id"))
          .distinct()
          .withColumn("label", org.apache.spark.sql.functions.col("id"))
        graft.graph.GraphAlgorithms.modularity(gs, "PLACED", comm).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      time(s"r$round assortativity(PLACED)") {
        graft.graph.GraphAlgorithms.assortativity(gs, "PLACED").count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // biased walks on the bipartite graph stop at order sinks after one
      // step, so this measures the candidate join + window-pick cost of
      // step 2 over |V|·reps frontier rows plus the adjacency build
      time(s"r$round biasedRandomWalks(PLACED, 3)") {
        graft.graph.GraphAlgorithms.biasedRandomWalks(gs, "PLACED",
          walkLen = 3).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      time(s"r$round eigenvectorCentrality(PLACED, 5)") {
        graft.graph.GraphAlgorithms.eigenvectorCentrality(gs, "PLACED",
          iters = 5).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // landmark-sampled Brandes: 8 fixed sources — per-source cost is a
      // frontier BFS + backward sweep over the bipartite graph (2 levels
      // deep), so wall clock tracks |E| touched, not all-pairs
      time(s"r$round betweenness(PLACED, 8 landmarks)") {
        graft.graph.GraphAlgorithms.betweennessCentrality(gs, "PLACED",
          sources = (1L to 8L), maxDepth = 6).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // Louvain on the bipartite graph: every order has exactly one
      // customer edge, so local moving converges in round 1 (orders adopt
      // their customer's community) — the measured cost is the canonical
      // edge build + per-round gain join at |E|
      time(s"r$round louvain(PLACED, 2 rounds)") {
        graft.graph.GraphAlgorithms.louvain(gs, "PLACED", rounds = 2)
          .count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // customer->order edges form a DAG, so every SCC is a singleton;
      // the probe measures the Pregel label-convergence cost over |E|
      time(s"r$round scc(PLACED, 5)") {
        graft.graph.GraphAlgorithms.stronglyConnectedComponents(gs,
          "PLACED", numIter = 5).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // GraphX Pregel on the high-diameter collided graph: supersteps ∝
      // diameter (hundreds at sf0.1), so this exercises the
      // spark.graphx.pregel.checkpointInterval lineage truncation that
      // keeps deep Pregel runs from overflowing the stack
      time(s"r$round connectedComponents(PLACED)") {
        graft.graph.GraphAlgorithms.connectedComponents(gs, "PLACED")
          .count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // 3 customer landmarks; BFS dies at order sinks after one level, so
      // the cost is the landmark BFS frontier joins + the fold aggregate
      time(s"r$round closeness(PLACED, 3 landmarks)") {
        graft.graph.GraphAlgorithms.closenessCentrality(gs, "PLACED",
          landmarks = Seq(1L, 2L, 3L)).count()
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // degeneracy of the bipartite graph is 1 (every order has degree
      // 1), so the decomposition runs the k=1 sweep plus the emptying
      // k=2 peel — the same two-full-|E|-peel worst case as kCore above
      time(s"r$round coreNumbers(PLACED)") {
        val n = graft.graph.GraphAlgorithms.coreNumbers(gs, "PLACED").count()
        println(s"[profile]   coreNumbers rounds=" +
          graft.graph.GraphAlgorithms.lastCorenessRounds.get)
        n
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
      // HUB/STAR probe (r13 verdict ask): one vertex adjacent to 10⁶
      // spokes, plus a 5-label ring among the spokes so propagation has
      // real label diversity. Before the run-length message encoding a
      // single combiner-tree message at the hub was a 10⁶-long raw
      // multiset (8 MB); with the hybrid encoding the hub's reduced
      // message is O(distinct spoke labels). The probe prints the exact
      // in-JVM message size for the hub's multiset alongside the wall
      // time of a 5-round propagation over the 10⁶-edge star.
      time(s"r$round labelprop(STAR 1e6-degree hub, 5)") {
        import org.apache.spark.sql.functions.{col, lit}
        val n = 1000000L
        val spokes = spark.range(1L, n + 1L)
        val star = spokes.select(lit(0L).as("from_S"), col("id").as("to_S"))
        val ring = spokes.select(col("id").as("from_S"),
          ((col("id") % 5L) + n + 1L).as("to_S"))
        val starGs = new graft.GraftSession(spark)
        starGs.registerTable("sn",
          spark.range(0L, n + 6L).select(col("id"), col("id").as("v")))
        starGs.registerNode("S", "sn", "id")
        starGs.registerTable("STAR", star.unionAll(ring))
        starGs.registerRel("STAR", "STAR", "S", "S")
        val cnt = graft.graph.GraphAlgorithms
          .labelPropagation(starGs, "STAR", iters = 5).count()
        // in-JVM evidence: fold the hub's steady-state multiset (one
        // message per spoke; after round 1 the spokes carry the handful
        // of surviving community labels, modeled as 5 here) through the
        // production merge and report the reduced message's footprint —
        // O(distinct labels), where the pre-r14 raw concat was O(degree)
        var hub = graft.graph.GraphAlgorithms.lpMsg(1L)
        var i = 2L
        while (i <= n) { hub = graft.graph.GraphAlgorithms.lpMergeMsgs(
          hub, graft.graph.GraphAlgorithms.lpMsg(i % 5L)); i += 1 }
        val norm = graft.graph.GraphAlgorithms.lpNormalize(hub)
        println(s"[profile]   star hub reduced message: ${hub.length} longs" +
          s" (${norm(0) / 2} distinct labels; a raw degree multiset would" +
          s" be $n)")
        cnt
      }
      graft.pipeline.PipelineCaches.clear(blocking = true)
    }
    spark.stop()
  }
}
