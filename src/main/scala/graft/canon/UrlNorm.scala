package graft.canon

/** Canonical URL normalization — the crawl-side twin of entity
  * canonicalization: re-crawls and mirror links reach the same page
  * through many spellings, and URL-keyed dedup/upsert (TripleStore is
  * url-keyed) only works if they collapse first. The contract is
  * deliberately SMALL and regex-definable so the q90 oracle can run
  * the identical steps in SQL:
  *
  *  1. scheme and host lowercased;
  *  2. default port stripped (:80 for http, :443 for https);
  *  3. fragment dropped;
  *  4. query params whose KEY starts with `utm_` (case-insensitive)
  *     dropped — the tracking-param family;
  *  5. remaining params sorted by their full `k=v` string (byte
  *     order), rejoined with `&`; an emptied query drops its `?`;
  *  6. empty path becomes `/`.
  *
  * A string that does not match the URL shape is returned UNCHANGED
  * (garbage in the url column must not be silently rewritten).
  * Deterministic, map-only, no java.net.URI (its parsing rules are not
  * SQL-mirrorable).
  */
object UrlNorm {

  /** Java/RE2-identical construct set (no backrefs/lookaround); the q90
    * oracle runs this string verbatim in DuckDB.
    */
  val UrlReStr =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"

  private val UrlRe = UrlReStr.r

  def canonical(url: String): String = url match {
    case UrlRe(scheme0, host0, port0, path0, query0, _) =>
      // Locale.ROOT (the engine-wide PyStr.lower convention): a Turkish
      // default locale would dot-map 'I' and diverge from the oracle's
      // lower()
      val scheme = scheme0.toLowerCase(java.util.Locale.ROOT)
      val host = host0.toLowerCase(java.util.Locale.ROOT)
      val port = Option(port0).getOrElse("") match {
        case ":80" if scheme == "http" => ""
        case ":443" if scheme == "https" => ""
        case p => p
      }
      val path = if (path0.isEmpty) "/" else path0
      val query = Option(query0).map(_.drop(1)).getOrElse("")
      // UTF-8 BYTE order (not String.compareTo's UTF-16 unit order), so
      // params containing astral characters sort exactly as the oracle's
      // DuckDB binary sort does
      val params = query.split("&", -1).filter(_.nonEmpty)
        .filterNot(p => p.toLowerCase(java.util.Locale.ROOT).startsWith("utm_"))
        .sortWith(graft.util.Utf8Order.lt)
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$host$port$path$q"
    case _ => url
  }
}
