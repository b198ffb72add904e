package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup lever in a crawl pipeline:
  * the same page is fetched under fragment/tracking-param/case/port
  * variants, and canonicalizing before the exact-dedup hash removes the
  * largest class of trivial duplicates without touching content at all
  * (crawlers dedup by canonical URL before ever comparing bytes).
  *
  * Rules (the classic safe subset — each preserves page identity):
  *   1. drop the `#fragment` (client-side only),
  *   2. lowercase the scheme and authority (host names are
  *      case-insensitive; the PATH keeps its case — it is not),
  *   3. drop the scheme's default port (`:80` for http, `:443` for https;
  *      non-default ports are kept — they address different servers),
  *   4. collapse duplicate slashes in the path and drop trailing ones,
  *   5. strip tracking query parameters (`utm_*`, `fbclid`, `gclid`),
  *      keeping all others, and re-anchor the survivors on `?`.
  *
  * Pure codegen'd string expressions — no UDF, no shuffle; at crawl scale
  * this runs inside the scan's whole-stage-codegen span. Param
  * reordering/percent-decoding are deliberately NOT applied: they can
  * change identity on servers that are order- or encoding-sensitive.
  */
object UrlNorm {

  /** Canonical form of `url` per the rules above. Non-URL strings pass
    * through steps 4–5 with an empty authority prefix (garbage in,
    * normalized garbage out — never null, never an error).
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // scheme://authority (authority = everything before the first /?#).
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val prefixLc = regexp_replace(
      regexp_replace(lower(prefix), "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$", "$1")
    val path = regexp_extract(rest, "^[^?]*", 0)
    val query = rest.substr(length(path) + 1, length(rest))
    val pathNorm = regexp_replace(regexp_replace(path, "/{2,}", "/"), "/+$", "")
    // Strip tracked params wherever they sit, then fix a survivor left
    // dangling on '&' because the stripped one carried the '?'. The '^&'
    // anchor fires at most once, so Spark's always-global replace is
    // exactly DuckDB's single replace here.
    val queryNorm = regexp_replace(
      regexp_replace(query, "[?&](utm_[a-z0-9_]+|fbclid|gclid)=[^&]*", ""),
      "^&", "?")
    concat(prefixLc, pathNorm, queryNorm)
  }

  /** The same rules as DuckDB SQL over a column expression `u` — kept
    * adjacent to [[canonicalize]] so the two rule lists cannot drift
    * silently. DuckDB needs the explicit 'g' flag (its replace is
    * first-match by default, Spark's is always global) and `\\1`
    * backreferences (RE2 replacement syntax, vs Java's `$1`).
    */
  def canonicalizeSql(u: String): String = {
    val noFrag = s"regexp_replace($u, '#.*', '')"
    val prefix = s"regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')"
    val rest = s"substr($noFrag, length($prefix) + 1)"
    val prefixLc =
      s"""regexp_replace(regexp_replace(lower($prefix),
         |      '^(http://[^:]*):80$$', '\\1'), '^(https://[^:]*):443$$', '\\1')""".stripMargin
    val path = s"regexp_extract($rest, '^[^?]*')"
    val query = s"substr($rest, length($path) + 1)"
    val pathNorm =
      s"regexp_replace(regexp_replace($path, '/{2,}', '/', 'g'), '/+$$', '')"
    val queryNorm =
      s"""regexp_replace(regexp_replace($query,
         |      '[?&](utm_[a-z0-9_]+|fbclid|gclid)=[^&]*', '', 'g'), '^&', '?')""".stripMargin
    s"$prefixLc || $pathNorm || $queryNorm"
  }
}
