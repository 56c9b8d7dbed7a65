package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.GraftException

/** Mid-query correlated `CALL { WITH ... }` subqueries (extension —
  * SURVEY.md §8.5): decorrelated grouped joins, per-key top-k, scope
  * rules. Small in-memory graph so expected values are hand-checkable. */
class MidCallSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("users",
      Seq((1L, "u1", 10L), (2L, "u2", 20L), (3L, "u3", 30L), (4L, "u4", 40L))
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

  test("correlated count per imported node alias; zero matches keep the row as 0") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) AS cnt }
        |RETURN u.name AS name, cnt ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("u1", 2L), ("u2", 2L), ("u3", 0L), ("u4", 0L)))
  }

  test("correlated sum coalesces to 0; avg stays null on zero matches") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post)
        |       RETURN sum(p.likes) AS s, avg(p.likes) AS a }
        |RETURN u.name AS name, s, a ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)))).toSeq
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("u1", 12L), ("u2", 10L), ("u3", 0L), ("u4", 0L)))
    assert(out(2)._3.isEmpty && out(0)._3.nonEmpty)
  }

  test("row-returning body inner-joins: zero matches drop, m matches fan out") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN p.title AS title }
        |RETURN u.name AS name, title ORDER BY name, title;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("u1", "p100"), ("u1", "p101"),
                      ("u2", "p102"), ("u2", "p103")))
  }

  test("correlated ORDER BY + LIMIT is per-input-row top-k, not a global cut") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post)
        |       RETURN p.likes AS likes ORDER BY likes DESC LIMIT 1 }
        |RETURN u.name AS name, likes ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("u1", 7L), ("u2", 9L)))
  }

  test("scalar column import after WITH is usable in body expressions") {
    val out = gs.cypher(
      """MATCH (u:User) WITH u.score AS sc
        |CALL { WITH sc MATCH (p:Post) WHERE p.likes < sc / 2
        |       RETURN count(p) AS under }
        |RETURN sc, under ORDER BY sc;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // likes: 5,7,9,1 — under sc/2 of 10→(1,5)? 5<5 false,1<5 true ⇒ 1;
    // 20/2=10 ⇒ 5,7,9,1 all but none ≥10 ⇒ 4; 30/2=15 ⇒ 4; 40/2=20 ⇒ 4
    assert(out == Seq((10L, 1L), (20L, 4L), (30L, 4L), (40L, 4L)))
  }

  test("node import carried through WITH (flat scope)") {
    val out = gs.cypher(
      """MATCH (u:User) WITH u WHERE u.score >= 20
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) AS cnt }
        |RETURN u.name AS name, cnt ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("u2", 2L), ("u3", 0L), ("u4", 0L)))
  }

  test("uncorrelated mid-position CALL executes once and cross joins") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { MATCH (p:Post) RETURN max(p.likes) AS top }
        |RETURN u.name AS name, top ORDER BY name LIMIT 2;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("u1", 9L), ("u2", 9L)))
  }

  test("chained CALLs: the second call imports the first call's output") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) AS cnt }
        |CALL { WITH cnt MATCH (q:Post) WHERE q.likes >= cnt RETURN count(q) AS ge }
        |RETURN u.name AS name, cnt, ge ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("u1", 2L, 3L), ("u2", 2L, 3L),
                      ("u3", 0L, 4L), ("u4", 0L, 4L)))
  }

  test("WITH after CALL filters and projects the call's output (interleaved stages)") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) AS cnt }
        |WITH u, cnt WHERE cnt > 0
        |RETURN u.name AS name, cnt ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("u1", 2L), ("u2", 2L)))
  }

  test("CALL → WITH → CALL: the second call imports a stage-projected value") {
    val out = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) AS cnt }
        |WITH u.name AS name, cnt * 10 AS bar
        |CALL { WITH bar MATCH (q:Post) WHERE q.likes > bar RETURN count(q) AS big }
        |RETURN name, bar, big ORDER BY name;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // bar: u1→20, u2→20, u3→0, u4→0; likes 5,7,9,1: >20 ⇒ 0; >0 ⇒ all 4
    assert(out == Seq(("u1", 20L, 0L), ("u2", 20L, 0L),
                      ("u3", 0L, 4L), ("u4", 0L, 4L)))
  }

  test("out-of-scope import, unused node import, and colliding output are loud") {
    val e1 = intercept[GraftException](gs.cypher(
      """MATCH (u:User) CALL { WITH zz MATCH (p:Post) RETURN count(p) AS c }
        |RETURN u.name AS n, c;""".stripMargin))
    assert(e1.getMessage.contains("not in scope"))
    val e2 = intercept[GraftException](gs.cypher(
      """MATCH (u:User) CALL { WITH u MATCH (p:Post) RETURN count(p) AS c }
        |RETURN u.name AS n, c;""".stripMargin))
    assert(e2.getMessage.contains("never uses it in a pattern"))
    val e3 = intercept[GraftException](gs.cypher(
      """MATCH (u:User) WITH u.name AS name
        |CALL { WITH name MATCH (p:Post) RETURN count(p) AS name }
        |RETURN name;""".stripMargin))
    assert(e3.getMessage.contains("collide"))
  }

  test("unaliased body returns keep their positional names despite key injection") {
    val df = gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN count(p) }
        |RETURN u.name AS name, count_0 ORDER BY name;""".stripMargin)
    assert(df.columns.toSeq == Seq("name", "count_0"))
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(2L, 2L, 0L, 0L))
  }

  test("scalar import in pre-WITH scope cannot name a raw table column") {
    // `score` is a users column but is NOT a bound name before any WITH —
    // Cypher scope, not the physical frame, governs imports
    val e = intercept[GraftException](gs.cypher(
      """MATCH (u:User)
        |CALL { WITH score MATCH (p:Post) WHERE p.likes < score RETURN count(p) AS c }
        |RETURN u.name AS n, c;""".stripMargin))
    assert(e.getMessage.contains("not in scope"))
  }

  test("correlated SKIP/LIMIT without ORDER BY is rejected") {
    val e = intercept[GraftException](gs.cypher(
      """MATCH (u:User)
        |CALL { WITH u MATCH (u)-[:Wrote]->(p:Post) RETURN p.likes AS l LIMIT 1 }
        |RETURN u.name AS n, l;""".stripMargin))
    assert(e.getMessage.contains("requires ORDER BY"))
  }
}
