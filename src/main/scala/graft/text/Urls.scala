package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization that
  * runs BEFORE any per-domain operator (budgets q86, mixing q59, corpus
  * reports q89) so that `HTTPS://WWW.Site.CO.UK:443/p/` and
  * `https://site.co.uk/p` key the same stratum, and dedup on URL doesn't
  * treat tracking-parameter noise as distinct pages.
  *
  * Everything is a row-local composition of builtin regex/string
  * expressions (codegen'd, pushable, zero shuffle) over patterns chosen
  * from the java.util.regex ∩ RE2 dialect intersection — no lookaround,
  * no backreferences — so a DuckDB oracle replays them symbol-for-symbol.
  *
  * Determinism contract: pure string functions of the input column. */
object Urls {

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased host of an absolute URL: authority minus userinfo minus
    * port. Null/schemeless input → null (a relative reference has no
    * host to normalize — surfacing null beats guessing). */
  def urlHost(url: Column): Column = {
    val auth = regexp_extract(url, AuthPat, 1)
    val noUser = regexp_replace(auth, "^[^@/]*@", "")
    val host = lower(regexp_replace(noUser, ":[0-9]+$", ""))
    when(regexp_extract(url, SchemePat, 1) === "" || host === "",
      lit(null).cast("string")).otherwise(host)
  }

  /** Tracking query parameters stripped by [[normalizeUrl]]: the
    * attribution noise (utm_*, click ids, bare ref) that makes one page
    * look like a thousand URLs. The anchored alternation is shared with
    * the oracle verbatim. */
  val TrackingParamPat = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="

  /** Canonical URL form:
    *   - scheme and host lowercased, userinfo dropped;
    *   - `www.` prefix dropped;
    *   - default ports stripped (http:80, https:443), others kept;
    *   - fragment dropped (client-side only — never reaches the server);
    *   - tracking params ([[TrackingParamPat]]) filtered from the query,
    *     remaining params kept IN ORDER (re-sorting would merge
    *     semantically-ordered queries some sites use);
    *   - trailing path slashes trimmed (`/p/` ≡ `/p`, `/` ≡ ``).
    * Null or schemeless input → null. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemePat, 1))
    val auth = regexp_extract(url, AuthPat, 1)
    val noUser = regexp_replace(auth, "^[^@/]*@", "")
    val port = regexp_extract(noUser, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(noUser, ":[0-9]+$", "")), "^www\\.", "")
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(url, PathPat, 1), "/+$", "")
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val keptQ = array_join(
      filter(split(rawQ, "&"),
        p => !(p.rlike(TrackingParamPat)) && p =!= ""),
      "&")
    val qPart = when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ))
    when(url.isNull || scheme === "" || host === "",
      lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** Multi-part public suffixes the [[registrableDomain]] heuristic
    * recognizes — a deliberately small, documented subset of the public
    * suffix list (the full PSL is a moving external artifact this
    * zero-egress build can't fetch; these cover the overwhelmingly
    * common ccTLD second-level registries). Extend per deployment. */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.in", "co.za", "com.br", "com.cn",
    "com.mx", "com.ar", "co.kr", "com.tr", "com.sg", "co.nz")

  /** Registrable domain (eTLD+1) of a HOST column — the "same site" key
    * per-domain curation actually wants (`a.news.example.co.uk` and
    * `b.example.co.uk` are one publisher): the last two labels, or the
    * last three when the last two form a recognized multi-part suffix
    * ([[MultiPartTlds]]). Single-label hosts (intranet names) and nulls
    * pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n < 2, host)
      .when(n >= 3 && last2.isin(MultiPartTlds: _*), last3)
      .otherwise(last2)
  }
}
