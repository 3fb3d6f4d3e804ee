package graft.tsdb

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the CGI parameter grammar (graphite_cgi.lua:
  * 429-441 via Cgi.parseParams/unescape): rendered query strings parse
  * back exactly — order kept, repeated names accumulated, empty values
  * dropped — and %XX unescaping is the exact inverse of UTF-8
  * percent-encoding, with invalid escapes and '+' left alone (the
  * reference's Lua url.unescape is %XX-only; vtitle does its own
  * '+'→' ' later).
  */
object CgiProps extends Properties("Cgi") {

  private val nameGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '_'))
  } yield cs.mkString

  // values exercise multibyte UTF-8, spaces, metacharacters — all of
  // which must round-trip through percent-encoding
  private val valueChar: Gen[Char] = Gen.oneOf(
    Gen.oneOf('a' to 'z'), Gen.oneOf('0' to '9'),
    Gen.oneOf(Seq(' ', '?', '*', '.', '{', '}', ',', '=', '&', '%', '+', 'é', 'ü', '日')))
  private val valueGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, valueChar)).map(_.mkString)

  /** Full percent-encoding of every byte — always a valid rendering,
    * decodable by the %XX-only unescaper.
    */
  private def enc(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"%%${b & 0xff}%02X").mkString

  property("unescape inverts UTF-8 percent-encoding") =
    forAll(valueGen) { v => Cgi.unescape(enc(v)) == v }

  property("invalid escapes and '+' pass through untouched") =
    forAll(Gen.oneOf("%zz", "%1", "a+b", "100%", "%G0ab", "%%2")) { s =>
      Cgi.unescape(s) == s
    }

  property("rendered query strings parse back: order, accumulation, empty-drop") =
    forAll(for {
      k <- Gen.choose(0, 6)
      ps <- Gen.listOfN(k, Gen.zip(nameGen, valueGen))
      withEmpty <- Gen.oneOf(true, false)
    } yield (ps, withEmpty)) { case (ps, withEmpty) =>
      val segs = ps.map { case (n, v) => s"$n=${enc(v)}" } ++
        (if (withEmpty) Seq("emptyval=") else Nil)
      val parsed = Cgi.parseParams(segs.mkString("&"))
      val expect = ps.foldLeft(Map.empty[String, Vector[String]]) {
        case (acc, (n, v)) => acc.updated(n, acc.getOrElse(n, Vector.empty) :+ v)
      }
      parsed == expect && !parsed.contains("emptyval")
    }

  property("junk segments between params never perturb the well-formed ones") =
    forAll(for {
      ps <- Gen.listOfN(3, Gen.zip(nameGen, valueGen))
      junk <- Gen.oneOf("", "noequals", "&&", "=leadingeq")
    } yield (ps, junk)) { case (ps, junk) =>
      // use distinct names so junk can't collide with a real param
      val named = ps.zipWithIndex.map { case ((n, v), i) => (s"p${i}_$n", v) }
      val q = (named.map { case (n, v) => s"$n=${enc(v)}" } :+ junk).mkString("&")
      val parsed = Cgi.parseParams(q)
      named.forall { case (n, v) => parsed.get(n).exists(_.contains(v)) }
    }
}
