package graft.tsdb

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the Graphite `.conf` parsers (VERDICT r7 survey,
  * ranked #3): the example-based ConfSpec pins the reference's own
  * files; these pin the GRAMMAR — random rule sets render to conf text
  * and parse back exactly, noise lines never perturb the result, and
  * the schemas/aggregation extraction agrees with an independent model
  * of the skip-incomplete-sections and default-fallback rules
  * (L_DataDaemon.lua:106-150, L_DataCache.lua:147-159).
  */
object ConfProps extends Properties("Conf") {

  // renderable charset: names can't contain ']' (SectionRe) and keys
  // can't contain '=', '(', or whitespace (ParamRe); values are
  // printable, trimmed, control-free — exactly what parse() preserves
  private val nameChars: Seq[Char] = ('a' to 'z') ++ Seq('.', '-', ' ', '*')
  private val keyChars: Seq[Char] = ('a' to 'z') ++ ('A' to 'Z') ++ Seq('.', '-', '_')
  private val valChars: Seq[Char] = ('a' to 'z') ++ Seq('=', ':', ',', '\\', '$', '*', '1', '5')
  private def str(chars: Seq[Char], lo: Int, hi: Int): Gen[String] = for {
    n <- Gen.choose(lo, hi)
    cs <- Gen.listOfN(n, Gen.oneOf(chars))
  } yield cs.mkString
  private val secName: Gen[String] =
    str(nameChars, 1, 8).suchThat(s => s.trim.nonEmpty)
  private val key: Gen[String] = str(keyChars, 1, 8)
  private val value: Gen[String] = str(valChars, 0, 10)
  private val param: Gen[(String, String)] = Gen.zip(key, value)
  private val section = for {
    n <- secName
    k <- Gen.choose(0, 4)
    ps <- Gen.listOfN(k, param)
  } yield Conf.Section(n, ps)
  private val sections = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, section))

  // render with the grammar's optional noise: comment lines, blank
  // lines, garbage (no '=' and not a section header), and the
  // `key (n) = value` numeric-parenthetical variant
  private val noiseLine = Gen.oneOf(
    Gen.const("# a comment = [not] a section"),
    Gen.const(""),
    Gen.const("   "),
    Gen.const("garbage line without an equals"),
    Gen.const("also(no match here"))
  private def render(ss: Seq[Conf.Section], withNoise: Boolean,
                     parenNum: Boolean): Gen[String] = {
    val lines = ss.flatMap { s =>
      s"[${s.name}]" +: s.params.map { case (k, v) =>
        if (parenNum) s"  $k (3) = $v" else s"  $k = $v"
      }
    }
    if (!withNoise) Gen.const(lines.mkString("\n"))
    else Gen.listOfN(lines.size + 1, noiseLine).map(noise =>
      noise.zipAll(lines, "", "").flatMap { case (n, l) => Seq(n, l) }
        .filter(_ != "").mkString("\n") + "\n" + noise.head)
  }

  property("rendered rule sets parse back exactly (order, duplicates, empty values)") =
    forAll(sections.flatMap(ss => render(ss, withNoise = false, parenNum = false)
      .map(t => (ss, t)))) { case (ss, text) =>
      Conf.parse(text) == ss
    }

  property("comment/blank/garbage lines and numeric parentheticals never perturb the parse") =
    forAll(for {
      ss <- sections
      paren <- Gen.oneOf(true, false)
      t <- render(ss, withNoise = true, parenNum = paren)
    } yield (ss, t)) { case (ss, text) =>
      Conf.parse(text) == ss
    }

  property("params before any [section] land in _anon_") =
    forAll(for {
      pre <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, param))
      ss <- sections
      t <- render(ss, withNoise = false, parenNum = false)
    } yield (pre, ss, t)) { case (pre, ss, t) =>
      val text = pre.map { case (k, v) => s"$k = $v" }.mkString("\n") +
        (if (t.isEmpty) "" else "\n" + t)
      Conf.parse(text) == (Conf.Section("_anon_", pre) +: ss)
    }

  // sections gain pattern/retentions fields with independent presence
  // bits — the extraction model: keep file order, skip sections missing
  // a required field, first occurrence of a duplicated key wins
  private val schemaSection = for {
    n <- secName
    hasPat <- Gen.oneOf(true, false)
    hasRet <- Gen.oneOf(true, false)
    pat <- Gen.oneOf(":Alarm", "\\.KWH", "^x", "a.*b")
    ret <- Gen.oneOf("1s:1m", "1m:1d,1h:90d", "5m:7d")
    extra <- Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, param))
  } yield Conf.Section(n,
    (if (hasPat) Seq("pattern" -> pat) else Nil) ++
      (if (hasRet) Seq("retentions" -> ret) else Nil) ++ extra)

  property("storageSchemas: file order kept, incomplete sections skipped") =
    forAll(Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, schemaSection))
      .flatMap(ss => render(ss, withNoise = false, parenNum = false)
        .map(t => (ss, t)))) { case (ss, text) =>
      val expect = ss.flatMap(s =>
        for (p <- s.get("pattern"); r <- s.get("retentions"))
          yield Conf.SchemaEntry(s.name, p, r))
      Conf.storageSchemas(text) == expect
    }

  private val aggSection = for {
    n <- secName
    hasPat <- Gen.oneOf(true, false)
    pat <- Gen.oneOf(":Alarm", "\\.KWH", "^x")
    xff <- Gen.oneOf(Seq("0", "0.5", "1", "not-a-number"))
    hasXff <- Gen.oneOf(true, false)
    m <- Gen.oneOf("sum", "last", "max")
    hasM <- Gen.oneOf(true, false)
  } yield Conf.Section(n,
    (if (hasPat) Seq("pattern" -> pat) else Nil) ++
      (if (hasXff) Seq("xFilesFactor" -> xff) else Nil) ++
      (if (hasM) Seq("aggregationMethod" -> m) else Nil))

  property("storageAggregation: whisper defaults fill missing or unparseable fields") =
    forAll(Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, aggSection))
      .flatMap(ss => render(ss, withNoise = false, parenNum = false)
        .map(t => (ss, t)))) { case (ss, text) =>
      val expect = ss.flatMap(s => s.get("pattern").map(p => Conf.AggEntry(s.name, p,
        s.get("xFilesFactor").flatMap(_.toDoubleOption).getOrElse(0.5),
        s.get("aggregationMethod").getOrElse("average"))))
      Conf.storageAggregation(text) == expect
    }
}
