package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.GraftException

/** Plain path bindings `p = (a)-[:R*lo..hi]->(b)`: per-path rows with
  * nodes(p) / relationships(p) / length(p) (extension — SURVEY.md §8.5).
  * Graph: 1→2, 1→3, 2→3, 3→4, 2→1 (one 2-cycle, so trail semantics —
  * edges unique, nodes revisitable — are observable). */
class PathValueSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("users",
      Seq((1L, "u1"), (2L, "u2"), (3L, "u3"), (4L, "u4"))
        .toDF("id", "name"))
    g.registerTable("Follows",
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 1L))
        .toDF("from_User", "to_User"))
    g.registerNode("User", "users", "id")
    g.registerRel("Follows", "Follows", "User", "User")
    g
  }

  private def paths(q: String): Seq[Seq[Long]] =
    gs.cypher(q).collect().toSeq
      .map(_.getSeq[Long](0).toSeq).sortBy(_.mkString(","))

  test("*1..2 returns one row per path, node revisits allowed") {
    val got = paths(
      """MATCH p = (a:User)-[:Follows*1..2]->(b:User)
        |RETURN nodes(p) AS path;""".stripMargin)
    val want = Seq(
      Seq(1L, 2L), Seq(1L, 3L), Seq(2L, 3L), Seq(3L, 4L), Seq(2L, 1L),
      Seq(1L, 2L, 3L), Seq(1L, 2L, 1L), Seq(1L, 3L, 4L),
      Seq(2L, 3L, 4L), Seq(2L, 1L, 2L), Seq(2L, 1L, 3L)
    ).sortBy(_.mkString(","))
    assert(got == want)
  }

  test("relationship uniqueness: an edge never repeats within one path") {
    // from [1,2,1] the only legal extension is 1→3 (1→2 would reuse (1,2))
    val got = paths(
      """MATCH p = (a:User)-[:Follows*3..3]->(b:User)
        |WHERE a.id = 1 RETURN nodes(p) AS path;""".stripMargin)
    assert(got == Seq(Seq(1L, 2L, 1L, 3L), Seq(1L, 2L, 3L, 4L)))
  }

  test("relationships(p) zips nodes; length(p) = hop count") {
    val rows = gs.cypher(
      """MATCH p = (a:User)-[:Follows*2..2]->(b:User) WHERE a.id = 1
        |RETURN nodes(p) AS path, relationships(p) AS rels, length(p) AS len;
        |""".stripMargin).collect()
    assert(rows.forall(_.getLong(2) == 2L))
    for (r <- rows) {
      val ns = r.getSeq[Long](0)
      val es = r.getSeq[org.apache.spark.sql.Row](1)
      assert(es.map(e => (e.getLong(0), e.getLong(1))) ==
        ns.zip(ns.tail))
    }
  }

  test("filters on endpoints compose with path outputs") {
    val got = paths(
      """MATCH p = (a:User)-[:Follows*1..3]->(b:User)
        |WHERE a.name = 'u1' AND b.id = 4 RETURN nodes(p) AS path;""".stripMargin)
    assert(got == Seq(Seq(1L, 2L, 3L, 4L), Seq(1L, 3L, 4L)))
    // the 4-hop trail 1→2→1→3→4 appears once the bound admits it
    val got4 = paths(
      """MATCH p = (a:User)-[:Follows*1..4]->(b:User)
        |WHERE a.name = 'u1' AND b.id = 4 RETURN nodes(p) AS path;""".stripMargin)
    assert(got4 == Seq(Seq(1L, 2L, 1L, 3L, 4L), Seq(1L, 2L, 3L, 4L),
      Seq(1L, 3L, 4L)).sortBy(_.mkString(",")))
  }

  test("undirected binding: one relationship is never reused in reverse") {
    import spark.implicits._
    val g2 = new GraftSession(spark)
    g2.registerTable("n2", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    g2.registerTable("E2", Seq((1L, 2L)).toDF("from_N2", "to_N2"))
    g2.registerNode("N2", "n2", "id")
    g2.registerRel("E2", "E2", "N2", "N2")
    // the single edge 1–2 yields exactly the two 1-hop orientations; a
    // 2-hop trail would have to traverse the SAME relationship backwards
    val one = g2.cypher(
      "MATCH p = (a:N2)-[:E2*1..1]-(b:N2) RETURN nodes(p) AS path;")
      .collect().map(_.getSeq[Long](0).toSeq).toSet
    assert(one == Set(Seq(1L, 2L), Seq(2L, 1L)))
    val two = g2.cypher(
      "MATCH p = (a:N2)-[:E2*2..2]-(b:N2) RETURN nodes(p) AS path;")
    assert(two.count() == 0)
  }

  test("UNWIND over nodes(p) fans each path out to its node ids") {
    val got = gs.cypher(
      """MATCH p = (a:User)-[:Follows*2..2]->(b:User) WHERE a.id = 1
        |UNWIND nodes(p) AS n RETURN n ORDER BY n;""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 3L, 4L))
  }

  test("nodes()/relationships() on shortestPath materialize one pinned path") {
    val rows = gs.cypher(
      """MATCH p = shortestPath((a:User {name:'u1'})-[:Follows*1..3]->(b:User))
        |RETURN b.id AS bid, length(p) AS len, nodes(p) AS path;""".stripMargin)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toSeq)))
      .toMap
    assert(rows(2L) == ((1L, Seq(1L, 2L))))
    assert(rows(3L) == ((1L, Seq(1L, 3L))))
    // 1→4: [1,3,4] (len 2) beats [1,2,3,4] (len 3)
    assert(rows(4L) == ((2L, Seq(1L, 3L, 4L))))
    // the 2-cycle: back to self in 2 hops
    assert(rows(1L) == ((2L, Seq(1L, 2L, 1L))))
    // relationships(p) zips the same pinned path
    val rels = gs.cypher(
      """MATCH p = shortestPath((a:User {name:'u1'})-[:Follows*1..3]->(b:User))
        |WHERE b.id = 4 RETURN relationships(p) AS rels;""".stripMargin)
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(rels.map(e => (e.getLong(0), e.getLong(1))) == Seq((1L, 3L), (3L, 4L)))
  }

  test("shortestPath path choice is deterministic: smallest node sequence") {
    import spark.implicits._
    val g2 = new GraftSession(spark)
    g2.registerTable("dn", (1L to 4L).map(i => (i, s"d$i")).toDF("id", "name"))
    // diamond: two length-2 paths 1→4; the pinned representative is the
    // lexicographically smallest node sequence [1,2,4]
    g2.registerTable("DE", Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("from_D", "to_D"))
    g2.registerNode("D", "dn", "id")
    g2.registerRel("DE", "DE", "D", "D")
    val got = g2.cypher(
      """MATCH p = shortestPath((a:D {id: 1})-[:DE*1..3]->(b:D {id: 4}))
        |RETURN nodes(p) AS path;""".stripMargin).collect()
    assert(got.length == 1)
    assert(got.head.getSeq[Long](0).toSeq == Seq(1L, 2L, 4L))
    // allShortestPaths keeps BOTH length-2 paths (one row each), and its
    // row count is the path count even when only length(p) is read
    val all = g2.cypher(
      """MATCH p = allShortestPaths((a:D {id: 1})-[:DE*1..3]->(b:D {id: 4}))
        |RETURN nodes(p) AS path;""".stripMargin)
      .collect().map(_.getSeq[Long](0).toSeq).sortBy(_.mkString(",")).toSeq
    assert(all == Seq(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
    val lens = g2.cypher(
      """MATCH p = allShortestPaths((a:D {id: 1})-[:DE*1..3]->(b:D {id: 4}))
        |RETURN length(p) AS len;""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(lens == Seq(2L, 2L), lens.toString)
  }

  test("fixed-length path binding stays a targeted error") {
    val e = intercept[GraftException](gs.cypher(
      "MATCH p = (a:User)-[:Follows]->(b:User) RETURN length(p) AS l;"))
    assert(e.getMessage.contains("var-length"))
  }
}
