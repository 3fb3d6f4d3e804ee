package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F46: URL canonicalization + URL-level dedup — the crawl-frontier
  * dedup that runs BEFORE any document is fetched (the cheapest
  * dedup a web pipeline has: two URLs that canonicalize equal are the
  * same resource, so one fetch serves both). Rules follow the common
  * canonicalizer set (w3lib/url-normalize style, restricted to the
  * uncontroversial core):
  *
  *   1. fragment stripped (`#...` is client-side only);
  *   2. scheme+authority lowercased (RFC 3986 §6.2.2.1 — case is
  *      insignificant there and ONLY there; the path stays);
  *   3. default ports stripped (`https://h:443/`, `http://h:80/`);
  *   4. a leading `www.` dropped;
  *   5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`) with
  *      separator cleanup;
  *   6. trailing `?`/`&` and trailing slashes dropped.
  *
  * Every rule is a codegen'd regexp in the Java∩RE2 dialect (the F22
  * discipline: no lookaround, no backrefs in PATTERNS — only in
  * replacements, where each engine uses its own `$1`/`\1` spelling),
  * so the DuckDB oracle replays the identical chain. Scheme identity
  * is preserved — http and https are different resources; merging them
  * is a policy call, not canonicalization.
  *
  * Scale shape: canonicalization is map-only; the dedup is one
  * count/min aggregate keyed by the canonical string — the same shape
  * as F1 exact dedup, but over 60-byte keys at frontier volumes
  * (billions of URLs, not documents — this is the operator that keeps
  * the fetch budget honest).
  */
object Urls {

  private val SchemeAuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"

  /** The canonicalization chain as one Column expression. */
  def canonicalize(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme://authority, keep the rest byte-for-byte
    val pre = regexp_extract(noFrag, SchemeAuthRe, 0)
    val lowered = concat(lower(pre),
      substring(noFrag, length(pre) + 1, lit(Int.MaxValue)))
    // 3. default ports (authority has no other ':', so the anchored
    //    group captures the full host)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?]*):443([/?]|$)", "$1$2"),
      "^(http://[^/:?]*):80([/?]|$)", "$1$2")
    // 4. www
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // 5. tracking params (keep the separator; cleanup follows)
    val noTrack = regexp_replace(noWww,
      "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    // 6. separator cleanup + trailing ?/&/slash
    val clean = regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    regexp_replace(regexp_replace(clean, "[?&]$", ""), "/+$", "")
  }

  /** URL-level dedup over a (doc_id, url) table: one row per canonical
    * URL with its raw-form count, distinct-document count, and the
    * min-doc keeper (the F1 keeper rule at URL granularity).
    */
  def urlDedup(urls: DataFrame): DataFrame =
    urls.select(col("doc_id"), canonicalize(col("url")).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .orderBy(col("url_canon"))

  /** Planted per-doc URL variants for the driver query — four raw
    * forms per id-arithmetic (host, path) class, three of which
    * canonicalize identically (case+port+fragment / www+trailing
    * slash+utm / plain) while the fourth keeps a real query param and
    * stays distinct. Docs sharing (id%5, id%11) merge across variant
    * classes, so the aggregate has genuine multiplicity.
    */
  def urlVariantsPlanted(docs: DataFrame): DataFrame = {
    val k = (col("doc_id") % 5).cast("string")
    val p = (col("doc_id") % 11).cast("string")
    docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("https://site"), k, lit(".example.com/a"), p))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTPS://SITE"), k, lit(".EXAMPLE.COM:443/a"), p,
            lit("#sec"), (col("doc_id") % 3).cast("string")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www.site"), k, lit(".example.com/a"), p,
            lit("/?utm_source=s"), (col("doc_id") % 2).cast("string")))
        .otherwise(
          concat(lit("https://site"), k, lit(".example.com/a"), p,
            lit("?id="), k, lit("&utm_campaign=c")))
        .as("url"))
  }
}
