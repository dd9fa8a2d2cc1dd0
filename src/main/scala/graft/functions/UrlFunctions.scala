package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key a web-scale corpus uses before
  * any content pass (the same page crawled as `HTTP://WWW.X.COM/a/` and
  * `http://x.com/a?utm_source=feed` must collapse to ONE fetch/doc).
  *
  * Everything here is built from codegen'd string built-ins (no UDF,
  * no custom expression): a fixed chain of regexp/split/filter steps
  * whose RESULT is reproducible in ANSI SQL for the oracle — each step
  * uses anchored single-match regexes, so Spark's replace-all vs
  * DuckDB's replace-first semantics cannot diverge.
  *
  * Canonical form:
  *   - scheme and host lowercased; path/query case preserved
  *   - fragment dropped
  *   - leading `www.` dropped from the host
  *   - default port dropped (`:443` for https, `:80` for http)
  *   - `utm_*` tracking params dropped; empty params dropped; param
  *     ORDER preserved (no resort — two URLs differing only in param
  *     order are genuinely ambiguous and left distinct)
  *   - trailing slashes dropped from a non-root path
  */
object UrlFunctions {

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = substring_index(rest, "/", 1)
    val pathq = rest.substr(length(auth) + 1, lit(1000000))
    val host0 = regexp_replace(lower(auth), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path = substring_index(pathq, "?", 1)
    val pathNorm = when(length(path) > 1, regexp_replace(path, "/+$", ""))
      .otherwise(path)
    val q0 = pathq.substr(length(path) + 2, lit(1000000))
    val kept = array_join(
      filter(split(q0, "&"),
        x => length(x) > 0 && !startswith(x, lit("utm_"))), "&")
    concat(scheme, lit("://"), host, pathNorm,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }
}
