package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.GraftException

/** Correlated and cross-alias conditions inside EXISTS { } — they ride
  * the semi/anti-join condition (round-9 extension; previously rejected
  * with "exactly one subquery-local alias"). Graph: users score 10..40;
  * posts likes 5,7,9,1; Wrote 1→{100,101}, 2→{102,103}. */
class CorrelatedExistsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("users",
      Seq((1L, "u1", 10L), (2L, "u2", 2L), (3L, "u3", 30L), (4L, "u4", 40L))
        .toDF("id", "name", "score"))
    g.registerTable("posts",
      Seq((100L, "p100", 5L), (101L, "p101", 7L), (102L, "p102", 9L),
          (103L, "p103", 1L))
        .toDF("pid", "title", "likes"))
    g.registerTable("Wrote",
      Seq((1L, 100L), (1L, 101L), (2L, 102L), (2L, 103L))
        .toDF("from_User", "to_Post"))
    g.registerNode("User", "users", "id")
    g.registerNode("Post", "posts", "pid")
    g.registerRel("Wrote", "Wrote", "User", "Post")
    g
  }

  private def names(q: String): Seq[String] =
    gs.cypher(q).collect().map(_.getString(0)).toSeq.sorted

  test("correlated EXISTS: subquery column compared against the outer row") {
    // u1 (score 10): posts 5,7 — none; u2 (score 2): posts 9,1 — 9 > 2 ✓
    val got = names(
      """MATCH (u:User)
        |WHERE EXISTS { (u)-[:Wrote]->(p:Post) WHERE p.likes > u.score }
        |RETURN u.name AS name;""".stripMargin)
    assert(got == Seq("u2"))
  }

  test("correlated NOT EXISTS is the exact complement") {
    val got = names(
      """MATCH (u:User)
        |WHERE NOT EXISTS { (u)-[:Wrote]->(p:Post) WHERE p.likes > u.score }
        |RETURN u.name AS name;""".stripMargin)
    assert(got == Seq("u1", "u3", "u4"))
  }

  test("outer-only conjunct under NOT EXISTS stays inside the negation") {
    // NOT(∃ post ∧ u.score > 5): u1 (10): has posts ∧ 10>5 ⇒ drop;
    // u2 (2): 2>5 false ⇒ keep even though posts exist; u3/u4: no posts ⇒ keep
    val got = names(
      """MATCH (u:User)
        |WHERE NOT EXISTS { (u)-[:Wrote]->(p:Post) WHERE u.score > 5 }
        |RETURN u.name AS name;""".stripMargin)
    assert(got == Seq("u2", "u3", "u4"))
  }

  test("mixed correlated + local conjuncts compose") {
    // local p.likes > 4 restricts the scan; correlated compares to outer
    val got = names(
      """MATCH (u:User)
        |WHERE EXISTS { (u)-[:Wrote]->(p:Post)
        |               WHERE p.likes > 4 AND p.likes < u.score }
        |RETURN u.name AS name;""".stripMargin)
    // u1 (10): posts 5,7 both >4 and <10 ✓; u2 (2): 9>4 but 9<2 false ✗
    assert(got == Seq("u1"))
  }

  test("correlated conjunct naming a later OPTIONAL MATCH alias is a targeted error") {
    val e = intercept[GraftException](gs.cypher(
      """MATCH (u:User)
        |WHERE EXISTS { (u)-[:Wrote]->(p:Post) WHERE p.likes > q.likes }
        |OPTIONAL MATCH (u)-[:Wrote]->(q:Post)
        |RETURN u.name AS name;""".stripMargin))
    assert(e.getMessage.contains("OPTIONAL MATCH"))
  }

  test("correlated COUNT { } keeps its targeted rejection") {
    val e = intercept[GraftException](gs.cypher(
      """MATCH (u:User)
        |RETURN u.name AS name,
        |  COUNT { (u)-[:Wrote]->(p:Post) WHERE p.likes > u.score } AS n;
        |""".stripMargin))
    assert(e.getMessage.contains("correlated CALL { }"))
  }
}
