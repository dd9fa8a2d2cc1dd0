package graft.sources

/** CIK-from-HTML scrape fallback (`cik_lookup.py:107-174`) for lookups the
  * ticker/title maps miss: the reference soup-parses the browse-edgar
  * company page; the same three outcomes here come from two anchored
  * regexes over the page (golden-tested against the reference's own
  * `tests/data/CIK` pages):
  *
  *   - [[Single]]: `<span class=companyName>… <a>0000320193 (see all…)</a>`
  *     → the anchor text's first token (`cik_lookup.py:144-146`);
  *   - [[Multiple]]: no companyName span but a `<table summary=Results>` —
  *     candidate company names are each row's second cell; the reference
  *     warns and skips the lookup (`cik_lookup.py:147-152,157-174`);
  *   - [[NotFound]]: neither → EDGARQueryError analog.
  */
object CikScraper {

  sealed trait Result
  final case class Single(cik: String) extends Result
  final case class Multiple(companies: Seq[String]) extends Result
  case object NotFound extends Result

  private val spanRe =
    "(?s)<span[^>]*class=\"?companyName\"?[^>]*>(.*?)</span>".r
  private val anchorTextRe = "(?s)<a(?:\\s[^>]*)?>\\s*(\\S+)".r
  private val tableRe =
    "(?s)<table[^>]*summary=\"?Results\"?[^>]*>(.*?)</table>".r

  private def stripTags(s: String): String = s.replaceAll("<[^>]*>", "")

  def scrape(html: String): Result =
    spanRe.findFirstMatchIn(html)
      .flatMap(span => anchorTextRe.findFirstMatchIn(span.group(1)))
      .map(m => Single(m.group(1)): Result)
      .getOrElse {
        tableRe.findFirstMatchIn(html) match {
          case Some(t) =>
            // pre-XHTML EDGAR markup leaves <tr>/<td> unclosed — split on
            // openers; the header row has <th> cells only and drops out
            val names = t.group(1).split("(?i)<tr[^>]*>").toSeq
              .map(row => row.split("(?i)<td[^>]*>").toSeq.drop(1))
              .collect { case cells if cells.length >= 2 =>
                stripTags(cells(1))
              }
            Multiple(names)
          case None => NotFound
        }
      }

  /** UDF shape: single-result CIK or null (multiple/none are skipped, as
    * the reference warns-and-skips).
    */
  def scrapeCikOrNull(html: String): String = scrape(html) match {
    case Single(cik) => cik
    case _ => null
  }
}
