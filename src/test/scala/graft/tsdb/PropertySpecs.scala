package graft.tsdb

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import scala.util.Try

/** Property tests: the glob compiler against an independent naive
  * matcher, and the retention parser/formatter roundtrip over randomly
  * generated valid archive chains.
  */
object GlobProps extends Properties("Glob") {

  // independent reference implementation of component glob matching
  private def compMatch(g: String, s: String): Boolean =
    if (g.isEmpty) s.isEmpty
    else g.head match {
      case '*' => (0 to s.length).exists(i => compMatch(g.tail, s.drop(i)))
      case '?' => s.nonEmpty && compMatch(g.tail, s.tail)
      case '{' =>
        val close = g.indexOf('}')
        g.substring(1, close).split(",").filter(_.nonEmpty)
          .exists(a => compMatch(a + g.substring(close + 1), s))
      case c => s.nonEmpty && s.head == c && compMatch(g.tail, s.tail)
    }

  private def globMatch(q: String, p: String): Boolean = {
    val qs = q.split("\\.", -1)
    val ps = p.split("\\.", -1)
    qs.length == ps.length && qs.zip(ps).forall { case (g, s) => compMatch(g, s) }
  }

  private val comp = Gen.oneOf("a", "b", "ab", "ba", "aab")
  private val globComp = Gen.oneOf("*", "?", "a", "b", "ab", "a*", "*b", "?b",
    "{a,b}", "{ab,b}a", "{a*,b}", "{?b,a}")
  private val path = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, comp)).map(_.mkString("."))
  private val query = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, globComp)).map(_.mkString("."))

  property("compiled regex agrees with naive matcher") =
    forAll(query, path) { (q, p) =>
      p.matches(Glob.queryToRegex(q, allowDeeper = false)) == globMatch(q, p)
    }

  // brace-only queries (no * / ?) expand into literal paths — each
  // expansion must be brace-free and matched by the original query
  private val braceComp = Gen.oneOf("a", "ab", "{a,b}", "{ab,b}a", "b{a,ab}")
  private val braceQuery = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, braceComp)).map(_.mkString("."))

  property("brace expansions are literal paths matched by the original query") =
    forAll(braceQuery) { q =>
      val re = Glob.queryToRegex(q, allowDeeper = false)
      val exp = Glob.expandBraces(q)
      exp.nonEmpty && exp.forall(e => !e.contains("{") && e.matches(re))
    }

  // MetricStore.pathPredicate pushes the glob's literal prefix into the
  // scan as a startswith conjunct — which is only sound if every true
  // glob match carries that prefix
  private def litPrefix(target: String): String = {
    val i = target.indexWhere(c => "*?{".indexOf(c) >= 0)
    if (i < 0) target else target.substring(0, i)
  }

  property("scan-pushed literal prefix never excludes a glob match") =
    forAll(query, path) { (q, p) =>
      !globMatch(q, p) || p.startsWith(litPrefix(q))
    }
}

object RetentionProps extends Properties("Retention") {

  private val archive: Gen[Retention.Archive] = for {
    step <- Gen.oneOf(1L, 2L, 5L, 10L, 30L, 60L, 300L, 600L, 3600L, 86400L)
    points <- Gen.choose(1L, 500L)
  } yield Retention.Archive(step, points)

  private val validChain: Gen[Seq[Retention.Archive]] =
    Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, archive))
      .map(as => Try(Retention.validate(as)).toOption)
      .suchThat(_.isDefined).map(_.get)

  property("format∘parse is identity on valid chains") =
    forAll(validChain) { as => Retention.parse(Retention.format(as)) == as }

  property("parse result is sorted by precision") =
    forAll(validChain) { as =>
      val steps = Retention.parse(Retention.format(as)).map(_.secondsPerPoint)
      steps == steps.sorted
    }
}

/** The whisper text pack relies on every field rendering at its fixed
  * printf width — a wider render would shift every ring-slot byte
  * offset after it. Pin the invariant across value magnitudes, and the
  * numeric round-trip through the tokenizing unpack.
  */
object WhisperPackProps extends Properties("WhisperPack") {
  import graft.sources.Whisper

  private val ts: Gen[Long] = Gen.choose(0L, 4294967295L) // u32 interval range
  private val value: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e6, 1e6),
    Gen.choose(-1e300, 1e300),
    Gen.choose(-1e-6, 1e-6),
    Gen.oneOf(0.0, -0.0, 1.0 / 3.0, math.Pi * 1e8))

  property("packPoint is always exactly PointSize bytes") =
    forAll(ts, value) { (t, v) =>
      Whisper.packPoint(t, v).length == Whisper.PointSize
    }

  property("point round-trips through pack + tokenize at %23.15g precision") =
    forAll(ts, value) { (t, v) =>
      val bytes = Whisper.packPoint(t, v).getBytes("US-ASCII")
      val pts = Whisper.archivePoints(bytes, Whisper.ArchiveInfo(0, 60L, 1))
      if (t == 0L) pts.isEmpty // zero interval = dead slot by definition
      else pts == Seq((t, v)) || {
        // %g carries 15 significant digits (the reference's own files
        // have the same precision), so rel error ≤ 5e-15 is inherent
        val (rt, rv) = pts.head
        rt == t && math.abs(rv - v) <= math.abs(v) * 1e-14
      }
    }
}

/** ShingleDistinct (the compiled distinct k-shingle counter) against an
  * independent sliding-window model, over token lists with forced
  * collisions (tiny alphabet, empty tokens included).
  */
object ShingleDistinctProps extends Properties("ShingleDistinct") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val tok = Gen.oneOf("a", "b", "ab", "")
  private val toks = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok))
  private val k = Gen.choose(1, 4)

  property("matches the sliding-window set-size model") =
    forAll(toks, k) { (ts, kk) =>
      val arr = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
      val model =
        if (ts.length < kk) 0L
        else ts.sliding(kk).map(_.mkString(" ")).toSet.size.toLong
      graft.functions.ShingleDistinct.compute(arr, kk) == model
    }
}
