package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher._

class ParserSpec extends AnyFunSuite {
  import Expr._

  private def read(q: String): ReadQuery =
    CypherParser.parse(q).asInstanceOf[ReadQuery]

  test("simple match-return") {
    val q = read("MATCH (a:User) RETURN a.name AS n;")
    assert(q.paths.size == 1)
    assert(q.paths.head.start == NodePattern(Some("a"), Some("User"), Seq.empty))
    assert(q.returnItems == Seq(ReturnItem(Prop("a", "name"), Some("n"))))
  }

  test("directions and inline props") {
    val q = read("MATCH (a:User {name: 'X'})-[f:Follows]->(b)<-[:Likes]-(c) RETURN c;")
    val Seq((r1, b), (r2, c)) = q.paths.head.hops
    assert(r1.dir == Dir.Out && r1.relType.contains("Follows") && r1.alias.contains("f"))
    assert(r2.dir == Dir.In && r2.relType.contains("Likes"))
    assert(q.paths.head.start.props == Seq("name" -> Lit("X")))
    assert(b.alias.contains("b") && c.alias.contains("c"))
  }

  test("undirected and anonymous") {
    val q = read("MATCH (a)-[]-(b)-->(c) RETURN a;")
    val Seq((r1, _), (r2, _)) = q.paths.head.hops
    assert(r1.dir == Dir.Undirected && r1.relType.isEmpty)
    assert(r2.dir == Dir.Out)
  }

  test("reserved words usable as labels and property names") {
    val q = read("MATCH (o:Order)-[l:CONTAINS]->(p:Part) WHERE o.`key` > 1 RETURN o.o_id AS `order`;")
    assert(q.paths.head.start.label.contains("Order"))
  }

  test("expression precedence: standard, not reference's flat fold") {
    val q = read("MATCH (a:U) WHERE a.x + 2 * 3 = 7 AND NOT a.y < 1 OR a.z = 2 RETURN a.x;")
    // OR at top
    val Bin("OR", andSide, Bin("=", Prop("a", "z"), Lit(2L))) = q.where.get
    val Bin("AND", eqSide, Not(Bin("<", _, _))) = andSide
    val Bin("=", Bin("+", Prop("a", "x"), Bin("*", Lit(2L), Lit(3L))), Lit(7L)) = eqSide
  }

  test("IN list, IS NULL, count(*), count(DISTINCT)") {
    val q = read(
      """MATCH (a:U) WHERE a.s IN ['x','y'] AND a.t IS NOT NULL
        |RETURN count(*) AS c, count(DISTINCT a.s) AS d;""".stripMargin)
    val conj = Expr.conjuncts(q.where.get)
    assert(conj.head == Bin("IN", Prop("a", "s"), ListLit(Seq(Lit("x"), Lit("y")))))
    assert(conj(1) == IsNull(Prop("a", "t"), negated = true))
    assert(q.returnItems.head.expr == Fn("count", Seq(Star)))
    assert(q.returnItems(1).expr == Fn("count", Seq(Prop("a", "s")), distinct = true))
  }

  test("order by, skip, limit, with") {
    val q = read(
      """MATCH (a:U)-[:R]->(b:V)
        |WITH a.id AS i, count(b) AS c WHERE c > 2
        |RETURN i, c ORDER BY c DESC, i SKIP 5 LIMIT 10;""".stripMargin)
    assert(q.withStages.size == 1)
    assert(q.withStages.head.where.isDefined)
    assert(q.orderBy == Seq(OrderItem(Var("c"), ascending = false), OrderItem(Var("i"), ascending = true)))
    assert(q.skip.contains(5L) && q.limit.contains(10L))
  }

  test("var-length bounds") {
    val q = read("MATCH (a:U)-[:R*1..3]->(b:U) RETURN b.x;")
    assert(q.paths.head.hops.head._1.varLength.contains((1, 3)))
    val q2 = read("MATCH (a:U)-[r:R*2]->(b:U) RETURN b.x;")
    assert(q2.paths.head.hops.head._1.varLength.contains((2, 2)))
  }

  test("CASE WHEN expression") {
    val q = read(
      "MATCH (a:U) RETURN CASE WHEN a.x > 1 THEN 'hi' ELSE 'lo' END AS b;")
    assert(q.returnItems.head.expr == CaseWhen(
      Seq((Bin(">", Prop("a", "x"), Lit(1L)), Lit("hi"))), Some(Lit("lo"))))
  }

  test("parameters") {
    val q = read("MATCH (a:U) WHERE a.name = $name RETURN a.id;")
    assert(q.where.get == Bin("=", Prop("a", "name"), Param("name")))
    val bound = Expr.bind(q.where.get, Map("name" -> "z"))
    assert(bound == Bin("=", Prop("a", "name"), Lit("z")))
  }

  test("DDL: create node table") {
    val d = CypherParser.parse(
      "CREATE NODE TABLE User (id UInt64, name String DEFAULT 'x', PRIMARY KEY (id), NODE ID (id));")
      .asInstanceOf[CreateNodeTable]
    assert(d.name == "User" && d.nodeId == "id" && d.primaryKey == Seq("id"))
    assert(d.columns.map(_.name) == Seq("id", "name"))
    assert(d.columns(1).default.contains(Expr.Lit("x")))
  }

  test("DDL: create rel table with adj index") {
    val d = CypherParser.parse(
      "CREATE REL TABLE Follows (FROM User TO User, since UInt32, ADJ INDEX true);")
      .asInstanceOf[CreateRelTable]
    assert(d.fromLabel == "User" && d.toLabel == "User" && d.adjIndex)
    assert(d.columns.map(_.name) == Seq("since"))
  }

  test("DDL validation errors") {
    assertThrows[GraftException](CypherParser.parse(
      "CREATE NODE TABLE U (id UInt64, PRIMARY KEY (id));")) // no NODE ID
    assertThrows[GraftException](CypherParser.parse(
      "CREATE NODE TABLE U (id UInt64, NODE ID (id));")) // no PK
  }

  test("parse errors are reported") {
    assertThrows[GraftException](CypherParser.parse("MATCH (a:U RETURN a;"))
    assertThrows[GraftException](CypherParser.parse("FOO BAR;"))
  }

  test("var-length bounds are validated: lo <= hi, hi capped") {
    assertThrows[GraftException](CypherParser.parse(
      "MATCH (a:U)-[:R*5..2]->(b:U) RETURN a.id AS id;"))
    val err = intercept[GraftException](CypherParser.parse(
      "MATCH (a:U)-[:R*1..100]->(b:U) RETURN a.id AS id;"))
    assert(err.getMessage.contains("composition cap"), err.getMessage)
    assert(err.getMessage.contains("shortestPaths"), err.getMessage)
    // the cap itself parses
    CypherParser.parse("MATCH (a:U)-[:R*1..30]->(b:U) RETURN a.id AS id;")
  }

  test("plain path binding gets a targeted error, not a generic parse failure") {
    val err = intercept[GraftException](CypherParser.parse(
      "MATCH p = (a:User)-[:Follows]->(b:User) RETURN p;"))
    assert(err.getMessage.contains("shortestPath"), err.getMessage)
    assert(err.getMessage.contains("'p'"), err.getMessage)
  }
}
