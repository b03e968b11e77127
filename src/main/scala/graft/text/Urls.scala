package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and host extraction — the crawl-frontier side of
  * a pretraining pipeline (URL-level dedup keys, domain mixing ratios,
  * domain blocklists all start from a CANONICAL url). Expression-only
  * (RE2-safe regexes, the [[Html]] discipline): batch == streaming ==
  * the DuckDB oracle, no UDF, no shuffle.
  *
  * Normalization (the conservative, semantics-preserving subset every
  * crawler applies): lowercase scheme+host, strip the fragment, strip
  * default ports (:80 http / :443 https), strip trailing "?" and a
  * trailing "/" on a bare host, collapse duplicate slashes in the PATH
  * ONLY (never the "://" authority separator, never the query string —
  * a "?next=https://x" redirect param must stay byte-identical or
  * distinct URLs merge under one dedup key). Query strings are KEPT —
  * dropping them changes identity (utm-stripping etc. is a policy
  * layer above this). Inputs without a scheme://authority prefix
  * (schemeless, protocol-relative "//host/path", garbage) pass through
  * UNCHANGED — guessing at their shape would corrupt them. */
object Urls {

  def normalizeUrl(url: Column): Column = {
    // regexp_replace can't lowercase a capture group, so split at the
    // end of the authority: lowercase scheme://host[:port], keep the
    // remainder byte-identical (paths are case-significant)
    val prefix = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = url.substr(length(prefix) + 1, length(url))
    val canonAuth = lower(prefix)
    val noFragment = regexp_replace(rest, "#.*$", "")
    // split path from query at the FIRST '?': the //+ collapse and the
    // bare-trailing-'?' strip are path/terminal rules and must not
    // touch query bytes
    val qpos = instr(noFragment, "?") // 1-based; 0 when absent
    val path = when(qpos > 0, noFragment.substr(lit(1), qpos - 1))
      .otherwise(noFragment)
    val query = when(qpos > 0,
        noFragment.substr(qpos, length(noFragment))).otherwise(lit(""))
    val pathFixed = regexp_replace(path, "//+", "/")
    val queryFixed = regexp_replace(query, "^\\?$", "")
    // drop :80/:443 only when they match the scheme's default
    val authFixed = when(canonAuth.startsWith("http://"),
        regexp_replace(canonAuth, ":80$", ""))
      .when(canonAuth.startsWith("https://"),
        regexp_replace(canonAuth, ":443$", ""))
      .otherwise(canonAuth)
    val joined = concat(authFixed, pathFixed, queryFixed)
    // bare authority with trailing slash only -> strip it
    val normalized = regexp_replace(joined, "^([A-Za-z0-9+.-]*://[^/?#]+)/$", "$1")
    when(length(prefix) > 0, normalized).otherwise(url)
  }

  /** The lowercased host of a url ("" when there is none). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))

  /** The registrable-ish domain: the last two dot-labels of the host
    * (the public-suffix list is a lookup-table refinement above this —
    * same layering as every crawler's first pass). */
  def urlDomain(url: Column): Column = {
    val host = urlHost(url)
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
  }
}
