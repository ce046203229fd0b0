package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-curation operators: URL canonicalization and URL-level
  * grouping — the normalization pass every web-corpus pipeline runs
  * before URL dedup, frontier scheduling, and per-site aggregation
  * (the rules are the standard RFC 3986 §6 syntax-based normalization
  * plus the tracking-parameter strip every crawler applies in
  * practice).
  *
  * Everything here is a PURE BUILT-IN Column expression — regexp
  * component extraction, higher-order array filter/sort — so it rides
  * whole-stage codegen with zero UDFs and replays exactly in an
  * external SQL engine: at 100 TB, canonicalization is a narrow
  * per-row map inside the scan stage, and the subsequent URL-group
  * aggregation is the only shuffle.
  */
object Crawl {

  /** Tracking parameters dropped during canonicalization (the
    * utm_* family plus the common click-id params). */
  final val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Canonical form of a URL column (RFC 3986 §6 syntax-based
    * normalization, crawl flavor):
    *  - scheme and host lowercased;
    *  - default ports stripped (`:80` for http, `:443` for https —
    *    and ONLY for their matching scheme; `:8080` etc. survive);
    *  - the fragment dropped (never sent to the server);
    *  - tracking query parameters dropped ([[TrackingParamPattern]]);
    *  - surviving query parameters SORTED (param order is not
    *    semantically significant for the overwhelming majority of
    *    endpoints, and unsorted params are the #1 cause of duplicate
    *    crawl URLs);
    *  - an empty path normalized to `/`;
    *  - a query left empty by the tracking strip loses its `?`.
    */
  def canonicalUrl(url: Column): Column = {
    val sch = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[^:]+://([^/?#]*)", 1))
    val rawPath = regexp_extract(url, "^[^:]+://[^/?#]*([^?#]*)", 1)
    val qs = regexp_extract(url, "\\?([^#]*)", 1)
    val host =
      when(sch === "http" && auth.rlike(":80$"),
        auth.substr(lit(1), length(auth) - 3))
        .when(sch === "https" && auth.rlike(":443$"),
          auth.substr(lit(1), length(auth) - 4))
        .otherwise(auth)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val params = array_join(
      array_sort(filter(split(qs, "&"),
        x => x =!= "" && !x.rlike(TrackingParamPattern))), "&")
    concat(sch, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** URL-level grouping over the canonical form: (url, n_docs,
    * first_doc) — the URL-dedup / revisit-policy aggregate. One
    * shuffle on the canonical key. */
  def urlGroups(df: org.apache.spark.sql.DataFrame, urlCol: Column,
                idCol: Column): org.apache.spark.sql.DataFrame =
    df.select(canonicalUrl(urlCol).as("url"), idCol.as("id"))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("first_doc"))
}
