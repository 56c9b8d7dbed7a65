package graft

import org.scalacheck.{Gen, Prop => SCProp, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher._

/** Property test: render(expr) reparses to the same AST — pins operator
  * precedence, literal escaping and associativity across the whole
  * expression grammar (SURVEY.md §5: "ScalaCheck property tests for parser
  * round-trips"). Uses raw ScalaCheck (the scalatest bridge artifact is
  * not in the offline cache). */
class ParserPropertySpec extends AnyFunSuite {

  private def check(prop: SCProp, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }
  import Expr._

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
    s = (h :: t).mkString
    if !Set("match", "where", "return", "order", "skip", "limit", "with",
            "and", "or", "not", "in", "is", "null", "true", "false", "as",
            "by", "asc", "desc", "distinct", "create", "node", "rel",
            "table", "from", "to", "key", "index", "set", "remove",
            "delete", "detach", "union", "primary", "adj", "optional",
            "ascending", "descending", "starts", "ends", "contains",
            "exists").contains(s)
  } yield s

  private val genLit: Gen[Expr] = Gen.oneOf(
    Gen.choose(0L, 999999L).map(Lit(_)),
    Gen.choose(0.5, 9999.5).map(d => Lit(math.rint(d * 100) / 100)),
    Gen.oneOf(true, false).map(Lit(_)),
    Gen.alphaNumStr.map(s => Lit(s.take(8))))

  private val genLeaf: Gen[Expr] = Gen.oneOf(
    genLit,
    genIdent.map(Var(_)),
    for { a <- genIdent; c <- genIdent } yield Prop(a, c))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%", "=", "<>", "<", ">", "<=", ">=",
                        "AND", "OR", "STARTS WITH", "ENDS WITH", "CONTAINS", "=~")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Bin(op, l, r)),
      1 -> genExpr(depth - 1).map(Not.apply),
      1 -> (for { e <- genExpr(depth - 1); n <- Gen.oneOf(true, false) } yield IsNull(e, n)),
      1 -> (for {
        name <- Gen.oneOf("abs", "round", "upper", "lower", "coalesce")
        a <- genExpr(depth - 1)
      } yield Fn(name, Seq(a))),
      1 -> Gen.listOfN(3, genLit).map(ListLit(_)))

  /** Fully parenthesized rendering — must reparse to the identical AST. */
  private def render(e: Expr): String = e match {
    case Lit(null)       => "null"
    case Lit(s: String)  => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case Lit(b: Boolean) => b.toString
    case Lit(v)          => v.toString
    case Star            => "*"
    case Var(n)          => n
    case Prop(a, c)      => s"$a.$c"
    case Param(n)        => s"$$$n"
    case ListLit(xs)     => xs.map(render).mkString("[", ", ", "]")
    case Fn(n, as, d)    => s"$n(${if (d) "DISTINCT " else ""}${as.map(render).mkString(", ")})"
    case Bin(op, l, r)   => s"(${render(l)} $op ${render(r)})"
    case Not(x)          => s"(NOT ${render(x)})"
    case Neg(x)          => s"(-${render(x)})"
    case IsNull(x, neg)  => s"(${render(x)} IS ${if (neg) "NOT " else ""}NULL)"
  }

  test("expression render → parse round-trip") {
    check(SCProp.forAll(genExpr(3)) { e =>
      val q = s"MATCH (a:U) WHERE ${render(e)} RETURN a.x;"
      CypherParser.parse(q).asInstanceOf[ReadQuery].where.contains(e)
    })
  }

  test("precedence: unparenthesized arithmetic binds tighter than comparison, AND tighter than OR") {
    check(SCProp.forAll(genLeaf, genLeaf, genLeaf) { (a, b, c) =>
      val q = s"MATCH (x:U) WHERE ${render(a)} + ${render(b)} * ${render(c)} > 0 OR " +
        s"${render(a)} = 1 AND ${render(b)} = 2 RETURN x.y;"
      CypherParser.parse(q).asInstanceOf[ReadQuery].where.get match {
        case Bin("OR", Bin(">", Bin("+", `a`, Bin("*", `b`, `c`)), _),
                 Bin("AND", Bin("=", `a`, _), Bin("=", `b`, _))) => true
        case _ => false
      }
    })
  }
}
