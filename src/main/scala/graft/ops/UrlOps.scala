package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL-1 canonicalization — the normalization every crawl pipeline
  * runs BEFORE content dedup (url-level dedup is the cheapest dedup
  * tier; RefinedWeb §3.1 and CommonCrawl practice both start there).
  * Frozen rule set, built ENTIRELY from codegen'd built-ins (split_part
  * / locate / substr / higher-order filter — no UDF, no java.net.URI
  * whose parsing the oracle could not mirror):
  *
  *  1. fragment dropped (everything from the first '#');
  *  2. scheme and host lowercased (path/query case preserved);
  *  3. default ports dropped (:80 for http, :443 for https; any other
  *     port kept);
  *  4. tracking params dropped from the query: any name starting with
  *     "utm_", plus fbclid and gclid; surviving params keep their
  *     original order (no reordering — a reorder would change
  *     semantics for servers that care);
  *  5. an emptied query drops its '?'.
  *
  * Deliberately NOT done (documented): trailing-slash stripping, %XX
  * case folding, duplicate-slash collapse — each changes which
  * distinct resources merge and belongs to a site-specific policy
  * layer, not the frozen default.
  *
  * PRECONDITION (r5 advice, recorded into the URL-1 contract): inputs
  * must be absolute URLs containing '://'. A scheme-relative, relative
  * or malformed URL yields a degenerate '<lowercased-input>://' string
  * (split_part returns the whole input as the scheme). Callers on raw
  * crawl data should pre-filter `locate('://', url) > 0`; changing the
  * in-function behavior would change URL-1's frozen oracle semantics.
  */
object UrlOps {

  def normalize(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val preQ = split_part(noFrag, lit("?"), lit(1))
    val qpos = locate("?", noFrag)
    val query = when(qpos > 0,
      noFrag.substr(qpos + 1, length(noFrag))).otherwise(lit(""))
    val scheme = lower(split_part(preQ, lit("://"), lit(1)))
    val rest = preQ.substr(length(scheme) + 4, length(preQ))
    val hostport = split_part(rest, lit("/"), lit(1))
    val path = rest.substr(length(hostport) + 1, length(rest))
    val host = lower(split_part(hostport, lit(":"), lit(1)))
    val port = when(locate(":", hostport) > 0,
      split_part(hostport, lit(":"), lit(2))).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !split_part(p, lit("="), lit(1)).isin("fbclid", "gclid"))
    val q2 = array_join(params, "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit("")))
  }

  /** Lowercased host (the grouping key for per-site caps/stats). */
  def host(url: Column): Column = {
    val preQ = split_part(split_part(url, lit("#"), lit(1)),
      lit("?"), lit(1))
    val scheme = lower(split_part(preQ, lit("://"), lit(1)))
    val rest = preQ.substr(length(scheme) + 4, length(preQ))
    lower(split_part(split_part(rest, lit("/"), lit(1)),
      lit(":"), lit(1)))
  }
}
