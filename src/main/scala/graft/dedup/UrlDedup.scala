package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the cheapest dedup layer a
  * web-scale training corpus runs FIRST (CCNet, RefinedWeb: the same
  * page is crawled under dozens of surface forms; collapsing them by
  * canonical URL removes whole-document duplicates before any content
  * hashing is paid). Everything is map-side string/array expressions —
  * one narrow pass, then one groupBy(canonical) — so the op is
  * embarrassingly parallel at any corpus size.
  *
  * Canonical form (the standard normalizations, each bit-reproducible
  * in the DuckDB oracle):
  *  - scheme and host lowercase; default ports (:80 http, :443 https)
  *    drop;
  *  - the fragment drops (never sent to the server);
  *  - tracking parameters drop (utm_*, fbclid, gclid, ref) — they vary
  *    per crawl path, not per page;
  *  - surviving query parameters SORT (order is almost never
  *    significant, and crawlers emit both orders);
  *  - trailing slashes on a non-root path drop; a bare root path
  *    normalizes to no path at all.
  */
object UrlDedup {

  /** Canonical form of a URL column (see object doc for the rules).
    *
    * A string with no well-formed `scheme://` prefix (relative path,
    * bare host, garbage) passes through UNCHANGED: the component
    * regexes would all extract empty strings and every malformed URL
    * would collapse onto the degenerate key "://", silently merging
    * unrelated documents. Pass-through keeps dedup total (identical
    * malformed strings still group) without ever merging distinct ones.
    */
  def canonicalize(url: Column): Column =
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), canonicalizeWellFormed(url))
      .otherwise(url)

  private def canonicalizeWellFormed(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(hostRaw)
    val pathRaw = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = regexp_replace(pathRaw, "/+$", "")
    val queryRaw = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(
      split(queryRaw, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, query)
  }

  /** `corpus_url_filter`: RefinedWeb-style URL quality filtering
    * (Penedo et al. 2023 §3.1 — the curation layer BEFORE any content
    * is fetched or scored): a hard domain blocklist (host equals a
    * blocked registrable domain or is a subdomain of one) plus a soft
    * weighted word score over the lowercased URL string; a document
    * keeps only if it is neither blocked nor at/over the score
    * threshold. Pure map-side string expressions — no shuffle, no
    * state; the blocklist and word table are compile-time-bounded
    * expression literals, never a join side.
    */
  def urlFilter(
      docs: DataFrame, urlCol: String,
      blockedDomains: Seq[String],
      badWords: Seq[(String, Double)],
      threshold: Double = 1.0): DataFrame = {
    require(blockedDomains.nonEmpty && badWords.nonEmpty,
      "urlFilter needs a blocklist and a word table")
    val u = lower(col(urlCol))
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    val blocked = blockedDomains.map(d =>
      host === d || host.endsWith("." + d)).reduce(_ || _)
    // left-to-right fold, 4-dp rounded once: the decision compares the
    // SAME rounded value the row reports, bit-stable across engines
    val score = round(badWords.map { case (w, wt) =>
      when(u.contains(w), lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _), 4) + lit(0.0)
    docs.select(col("doc_id"), host.as("host"), score.as("url_score"),
      blocked.as("blocked"),
      (!blocked && score < threshold).as("keep"))
  }

  /** URL-level dedup: one row per canonical URL — the smallest doc_id
    * wins (deterministic first-crawl keeper), with the surface-form
    * count as evidence. One map-side canonicalization + one hash
    * aggregation on the canonical key.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), canonicalize(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_forms"))
      .select(col(idCol), col("canonical_url"), col("n_forms"))
}
