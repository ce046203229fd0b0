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

  /** robots.txt decision per URL under RFC 9309 §2.2.2 longest-match
    * semantics: among a host's rules whose path prefix matches the
    * URL path, the LONGEST prefix wins; on an exact length tie the
    * ALLOW rule wins; a URL matching no rule is allowed by default.
    * (Final tie between equal-length same-verdict prefixes is broken
    * by prefix descending — decision-invariant, pinned for replay.)
    *
    * The rule table is tiny next to the frontier (robots files are
    * KBs), so the prefix match is a BROADCAST equi join on host with
    * the startsWith residual evaluated on the build side — never a
    * cartesian — and the longest-match argmax is an ordinary
    * max(struct) partial aggregation per URL: the longest-prefix-match
    * join shape (also IP routing / dictionary matching) at frontier
    * scale.
    *
    * @param rules (host, prefix, allow) — one row per robots rule.
    * @return (id, host, path, allowed, rule) with rule = '(default)'
    *         for unmatched URLs. */
  def robotsDecision(urls: org.apache.spark.sql.DataFrame, idCol: Column,
                     hostCol: Column, pathCol: Column,
                     rules: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val u = urls.select(idCol.as("_id"), hostCol.as("_host"),
      pathCol.as("_path"))
    val j = u.join(broadcast(rules),
      col("_host") === rules("host") &&
        col("_path").startsWith(rules("prefix")), "left")
    j.groupBy(col("_id"), col("_host"), col("_path"))
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("len"), col("allow").as("allow"),
          col("prefix").as("prefix")))).as("best"))
      .select(col("_id").as("id"), col("_host").as("host"),
        col("_path").as("path"),
        coalesce(col("best.allow"), lit(true)).as("allowed"),
        coalesce(col("best.prefix"), lit("(default)")).as("rule"))
  }

  /** HTML MAIN-CONTENT EXTRACTION — the tag-strip / link-harvest /
    * boilerplate-signal pass between fetch and text curation in every
    * web-corpus pipeline (the regex tier of trafilatura/jusText-class
    * extractors; semantics-bearing rules only, no DOM):
    *
    *  - `title`: first `<title>…</title>` payload (non-greedy);
    *  - script/style SUBTREES removed before the tag strip (their
    *    payload is code, not content — a plain tag strip would leak
    *    it into the text), then comments, then all remaining tags;
    *    whitespace runs collapsed, ends trimmed;
    *  - `links`: every `href="…"`/`href='…'` value in document order,
    *    '|'-joined (the frontier-expansion harvest), plus `n_links`;
    *  - `text_ratio6`: stripped-text length over raw HTML length
    *    (×10⁶ integral division) — the classic text-to-markup
    *    boilerplate signal low-content chrome pages fail.
    *
    * Pure built-in regexp Column expressions (codegen, zero UDFs,
    * replays in any RE2/PCRE engine — `(?s)` and non-greedy are
    * common dialect); at 100 TB this is a narrow per-row map fused
    * into the scan stage, no shuffle at all.
    *
    * @return input + (title, text, n_links, links, html_len,
    *         text_len, text_ratio6). */
  def htmlExtract(df: org.apache.spark.sql.DataFrame, htmlCol: Column)
      : org.apache.spark.sql.DataFrame = {
    // (?i): real markup mixes case — '<SCRIPT>' must not leak its
    // body. The close-tag alternation accepts a mismatched pair
    // ('<script>…</style>' ends the strip early) — the pinned
    // RE2-compatible semantic, since RE2 has no backreferences.
    val noScript = regexp_replace(htmlCol,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val stripped = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val text = trim(regexp_replace(stripped, "\\s+", " "))
    val links = regexp_extract_all(htmlCol,
      lit("(?i)href=[\"']([^\"']+)[\"']"), lit(1))
    df.withColumn("title",
        regexp_extract(htmlCol, "(?is)<title>(.*?)</title>", 1))
      .withColumn("text", text)
      .withColumn("n_links", size(links).cast("long"))
      .withColumn("links", array_join(links, "|"))
      .withColumn("html_len", length(htmlCol).cast("long"))
      .withColumn("text_len", length(text).cast("long"))
      .withColumn("text_ratio6",
        expr("text_len * 1000000 div html_len"))
  }
}
