package graft.tsdb

/** Graphite metric-path glob handling: `*`, `?`, `{a,b}` value lists.
  *
  * The reference expands `{...}` lists with a coroutine
  * (/root/reference/L_DataGraphiteAPI.lua:92-105) and converts each
  * path component to a Lua pattern per tree level
  * (/root/reference/L_DataFinders.lua:182-214). We compile the whole
  * query to a single anchored regex (portable Java/RE2 subset) so it
  * can be pushed into a parquet-scan `rlike` filter instead of a
  * per-level tree walk.
  */
object Glob {

  /** Expand `pre{A,B}post{X,Y}` into the full cross product, in the
    * reference's order (depth-first, list order).
    */
  def expandBraces(x: String): Seq[String] = {
    val braceRe = """(?s)^(.*?)(\{[^{}]*\})(.*)$""".r
    x match {
      case braceRe(pre, braces, post) =>
        val items = braces.substring(1, braces.length - 1).split(",").filter(_.nonEmpty)
        items.toSeq.flatMap(item => expandBraces(post).map(p => pre + item + p))
      case _ => Seq(x)
    }
  }

  private def quoteRegex(c: Char): String =
    if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) "\\" + c else c.toString

  /** One glob path-component → regex fragment. `*` and `?` never cross
    * a `.` boundary (they match within a single tree level, as in the
    * reference's per-component matching).
    */
  def componentToRegex(comp: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < comp.length) {
      comp.charAt(i) match {
        case '*' => sb.append("[^.]*")
        case '?' => sb.append("[^.]")
        case '{' =>
          val close = comp.indexOf('}', i)
          require(close > i, s"unbalanced brace in '$comp'")
          // drop empty alternatives ('{a,}' → just 'a'), mirroring
          // expandBraces — '(a|)' would also match an empty component,
          // so the fast regex path would disagree with expansion
          val alts = comp.substring(i + 1, close).split(",")
            .filter(_.nonEmpty).map(_.flatMap(quoteRegex)).mkString("|")
          sb.append("(").append(alts).append(")")
          i = close
        case c => sb.append(quoteRegex(c))
      }
      i += 1
    }
    sb.toString
  }

  /** Compile a full dotted glob query. Matches paths whose first
    * `depth(query)` components match; `allowDeeper` additionally
    * accepts longer paths (for branch-node discovery).
    */
  def queryToRegex(query: String, allowDeeper: Boolean): String = {
    val comps = query.split("\\.").map(componentToRegex)
    val tail = if (allowDeeper) "(\\..+)?" else ""
    "^" + comps.mkString("\\.") + tail + "$"
  }

  def depth(query: String): Int = query.split("\\.").length
}
