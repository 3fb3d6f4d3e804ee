package graft.tsdb

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.tsdb.TargetExpr._

/** Round-trip properties for the render-target grammar: random ASTs
  * render to canonical text and parse back structurally identical, so
  * no corner of the grammar (nested calls, brace-globs with commas,
  * quoted strings, negative/float numbers, bools) can drift between
  * the renderer and the parser.
  */
object TargetExprProps extends Properties("TargetExpr") {

  private val pathGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    comps <- Gen.listOfN(n, Gen.oneOf(
      "vera", "u1?", "click", "a*b", "x", "cpu-0", "1min", "{a,bc}", "d{e,f}g"))
  } yield comps.mkString(".")

  private val fnName: Gen[String] = Gen.oneOf(
    "sumSeries", "alias", "scale", "movingAverage", "summarize", "f_1", "Gx",
    "groupByNode", "nPercentile", "stdev", "sortByMaxima", "aliasSub",
    "mostDeviant", "hitcount", "integralByInterval", "divideSeries")

  private val strArg: Gen[Arg] = Gen.oneOf(
    "1hour", "avg", "a b c", "x,y", "(paren)", "").map(StrArg.apply)
  private val numArg: Gen[Arg] = Gen.oneOf(
    NumArg(0), NumArg(2), NumArg(-1.5), NumArg(0.25), NumArg(100))
  private val boolArg: Gen[Arg] = Gen.oneOf(BoolArg(true), BoolArg(false))

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) pathGen.map(PathExpr.apply)
    else Gen.frequency(
      2 -> pathGen.map(e => PathExpr(e): Expr),
      3 -> (for {
        n <- fnName
        k <- Gen.choose(1, 3)
        args <- Gen.listOfN(k, Gen.frequency(
          3 -> exprGen(depth - 1).map(e => SeriesArg(e): Arg),
          1 -> strArg, 1 -> numArg, 1 -> boolArg))
      } yield CallExpr(n, args): Expr))

  property("render → parse is the identity on ASTs") =
    forAll(exprGen(3)) { e => parse(render(e)) == e }

  // spaces belong at CALL boundaries only — inside a brace glob they
  // would change the path token itself
  private def renderSpaced(e: Expr): String = e match {
    case PathExpr(g) => g
    case CallExpr(n, args) => args.map {
      case SeriesArg(s) => renderSpaced(s)
      case NumArg(v) => SeriesFunctions.fmtNum(v)
      case StrArg(s) => "\"" + s + "\""
      case BoolArg(b) => b.toString
    }.mkString(s"$n( ", " , ", " )")
  }

  property("whitespace around call delimiters never changes the parse") =
    forAll(exprGen(2)) { e => parse(renderSpaced(e)) == e }
}
