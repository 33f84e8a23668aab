package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level dedup — C4's other dedup axis (Raffel et al. 2020 dedupe
  * at the URL level before content dedup; Common Crawl index keys are
  * canonicalized URLs). Canonicalization is the RFC 3986 §6
  * normalization subset that is safely semantics-preserving, plus the
  * standard tracking-parameter strip every crawl pipeline applies:
  *
  *   - scheme and host lowercased (§6.2.2.1 case normalization)
  *   - fragment dropped (never sent to the server)
  *   - default port stripped (:443 for https, :80 for http — §6.2.3)
  *   - empty path → "/", trailing slash stripped otherwise
  *   - utm_* / ref= query parameters dropped (tracking, not content);
  *     remaining parameters KEPT in order (reordering is not always
  *     semantics-preserving)
  *
  * All row-local string/regex ops in the Java-regex ∩ RE2 common
  * subset, so a SQL oracle canonicalizes identically. */
object UrlOps {

  /** Row-local canonical form of a URL column.
    *
    * Precondition: a well-formed absolute URL (`scheme://host...`).
    * A scheme-less or host-less input passes through UNCHANGED (r12
    * ADVICE): collapsing every malformed URL onto a shared `'://'`
    * skeleton would falsely deduplicate distinct documents, and a
    * crawl pipeline treats an unparseable URL as its own key. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https",
        regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val rest = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path0 = when(rest === "", lit("/")).otherwise(rest)
    val path = when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("ref=") || p === ""))
    val q2 = array_join(kept, "&")
    when(scheme === "" || host === "", u)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
  }

  /** Host (lowercased, port-stripped) of a CANONICAL url column. */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** The domain-suffix chain of a host — `ads.src1.example.com` →
    * [ads.src1.example.com, src1.example.com, example.com, com] — the
    * Public-Suffix-List expansion trick that turns "host equals a
    * blocklist entry OR is a subdomain of one" into an EQUI-join: a
    * naive `host = b OR host LIKE '%.' || b` predicate forces a
    * broadcast nested-loop (O(hosts × entries) with no hashing, the
    * plan shape this repo's guard zeroes), while exploding ≤ label-count
    * suffixes hash-joins against the broadcast entry set. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), greatest(size(parts), lit(1))),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Domain blocklist filter — the crawl front-gate (C4/CCNet drop
    * bad-word and spam DOMAINS before any content processing): a doc is
    * blocked when its canonical host equals a blocklist entry or sits
    * under one (subdomain-suffix semantics, the way adblock/PSL domain
    * rules match). `blocklist` is the small (pattern) frame — thousands
    * of rows against billions of docs — so it BROADCASTS; the corpus
    * side is one row-local canonicalize + suffix-explode (≤ host label
    * count rows each) + broadcast hash join + per-doc aggregate. Emits
    * one row per input doc: (doc, host, blocked, rule — the most
    * specific = longest matching entry, null when kept). */
  def hostBlocklist(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val entries = blocklist.select(col(blocklist.columns.head).as("_rule"))
    val hosts = df.select(col(idCol).cast("long").as("doc"),
      hostOf(canonicalUrl(col(urlCol))).as("host"))
    hosts.select(col("doc"), col("host"),
        explode(hostSuffixes(col("host"))).as("_sfx"))
      .join(broadcast(entries), col("_sfx") === col("_rule"), "left")
      .groupBy(col("doc"), col("host"))
      .agg(max(col("_rule").isNotNull).as("blocked"),
        max(struct(length(col("_rule")).as("_l"), col("_rule").as("_r")))
          .getField("_r").as("rule"))
  }

  /** URL dedup decision: canonicalize, keeper = min id per canonical
    * form. Emits (doc, host, canon, is_keeper). Canonicalization is
    * row-local (scan-pushable); the dedup is ONE hash aggregate keyed
    * by the canonical string + one canon-keyed join back — the exact
    * shape of content-exact dedup, on the URL axis. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val c = df.select(col(idCol).cast("long").as("doc"),
        canonicalUrl(col(urlCol)).as("canon"))
      .withColumn("host", hostOf(col("canon")))
    val keep = c.groupBy(col("canon")).agg(min(col("doc")).as("_keeper"))
    c.join(keep, "canon")
      .select(col("doc"), col("host"), col("canon"),
        (col("doc") === col("_keeper")).as("is_keeper"))
  }
}
