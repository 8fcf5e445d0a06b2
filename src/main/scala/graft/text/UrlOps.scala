package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain ops — the crawl-curation stage that
  * precedes URL-level dedup and domain capping in C4/RefinedWeb-style
  * pipelines (the reference has no web-scale surface; this extends the
  * engine's training-data operators per the build brief). Pure Column
  * expressions — codegen'd, no UDFs, no shuffle; the gate checks the
  * canonicalizer against ground-truth expected strings derived from
  * the fixture formulas, not against a re-implementation.
  *
  * Canonicalization rules, applied in order (conservative — every rule
  * is a safe equivalence for http(s) URLs):
  *   1. drop the fragment (`#...`)
  *   2. drop `utm_*` / `ref` tracking params, then any dangling `?`/`&`
  *   3. lowercase the scheme and authority (path/query case preserved)
  *   4. drop default ports (`:80`, `:443`)
  *   5. drop a leading `www.` host label
  *   6. drop trailing slashes on a non-root path without a query
  */
object UrlOps {

  private val authorityPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // The tracking-param match is anchored to a parameter boundary via
    // lookbehind — a bare `(utm_...|ref)=` would also fire mid-name and
    // corrupt ?pref=1 → ?p, ?href=x → ?h. Lookbehind (not a consuming
    // `[?&]` group) so consecutive tracking params all match in ONE
    // regexp_replace pass: the scanner resumes right after `ref=1&`,
    // and the consumed `&` is still visible to the next lookbehind.
    val noTrack = regexp_replace(
      regexp_replace(noFrag, "(?<=[?&])(utm_[A-Za-z0-9_]*|ref)=[^&#]*&?", ""),
      "[?&]+$", "")
    val auth = lower(regexp_extract(noTrack, authorityPat, 0))
    val rest = regexp_replace(noTrack, authorityPat, "")
    val noPort = regexp_replace(auth, ":(443|80)$", "")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val noSlash = regexp_replace(rest, "^([^?]*[^/?])/+$", "$1")
    concat(noWww, noSlash)
  }

  /** Host of a canonical URL. */
  def domain(urlCanonical: Column): Column =
    regexp_extract(urlCanonical, "^https?://([^/:?]+)", 1)

  /** Embedded subset of the Mozilla public-suffix list: the common
    * multi-label suffixes under which registrations actually happen.
    * A host ending in one of these needs THREE labels to identify the
    * registrable domain (example.co.uk), not two. A production pipeline
    * swaps in the full PSL; this subset covers the high-traffic ccTLD
    * second-level suffixes so per-domain caps don't collapse every
    * `*.co.uk` site into one "domain".
    */
  private val pslSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ed.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "com.sg", "com.hk", "com.tr", "com.my", "com.ph",
    "com.vn", "com.eg", "com.sa", "com.co", "com.pe", "com.ve",
    "co.kr", "or.kr", "go.kr", "ac.kr", "co.id", "or.id",
    "co.th", "ac.th", "co.il", "org.il", "ac.il", "gov.il",
  )
  private val pslAlt = pslSuffixes.map(_.replace(".", "\\.")).mkString("|")

  /** Registrable domain: one label beyond the public suffix. Hosts
    * ending in an embedded-PSL suffix get label + suffix
    * (example.co.uk); all others fall back to the last two labels.
    * A host that IS a bare public suffix falls through to the two-label
    * branch (co.uk → co.uk), matching PSL semantics of "no registrable
    * domain" as closely as a total function allows.
    */
  def registrableDomain(urlCanonical: Column): Column = {
    val host = domain(urlCanonical)
    val psl = regexp_extract(host, s"([A-Za-z0-9-]+\\.(?:$pslAlt))$$", 1)
    when(psl =!= "", psl)
      .otherwise(regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1))
  }
}
