package graft.functions

import scala.util.matching.Regex

/** Minimal HTML extraction for the Weewx report-page source (S15,
  * ref `TelemetryToRaven/Weewx/WeewxLogger.cs:26-61`): the reference
  * scrapes label/data cell pairs out of `#current_widget` /
  * `#about_widget` table rows plus the `.lastupdate` stamp. The
  * sandbox has no HTML library, and the scraped grammar is three
  * fixed shapes, so this is a purpose-built extractor (not a general
  * parser): widget div → first table → `<tr>` blocks → single
  * label/data cell per row, with entity-decoded text content.
  */
object Html {

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "deg" -> "°",
    "diams" -> "♦", "sup2" -> "²", "sup3" -> "³")

  // named entities may carry trailing digits (&sup2; &sup3; &frac12;)
  private val entityRegex: Regex =
    """&(#[xX][0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);""".r

  /** Entity decode that never throws: malformed or out-of-range
    * references (overflow digits, invalid code points) pass through
    * verbatim instead of aborting the whole page scrape.
    */
  def decodeEntities(s: String): String =
    entityRegex.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        try {
          if (body.startsWith("#x") || body.startsWith("#X"))
            Character.toString(Integer.parseInt(body.drop(2), 16))
          else if (body.startsWith("#"))
            Character.toString(body.drop(1).toInt)
          else namedEntities.getOrElse(body, m.matched)
        } catch { case _: IllegalArgumentException => m.matched }
      Regex.quoteReplacement(out)
    })

  /** AngleSharp-style TextContent of a fragment: tags stripped,
    * entities decoded, whitespace preserved (the Weewx value grammar
    * itself handles ragged spacing like "1010.5 mbar (   N/A)").
    */
  def textContent(fragment: String): String =
    decodeEntities(fragment.replaceAll("(?s)<[^>]*>", ""))

  private def tdByClass(row: String, cls: String): Seq[String] =
    s"""(?s)<td[^>]*class=["'][^"']*\\b$cls\\b[^"']*["'][^>]*>(.*?)</td>""".r
      .findAllMatchIn(row).map(m => textContent(m.group(1))).toSeq

  /** The (label, data) cell pairs of one widget's first table — the
    * `QuerySelector("#id").QuerySelectorAll("tr")` + Single-label /
    * Single-data projection of `WeewxLogger.cs:33-41`. Rows without
    * exactly one label and one data cell are skipped (the reference
    * only ever points this at widgets whose rows are well-formed).
    */
  def widgetRows(html: String, widgetId: String): Seq[(String, String)] = {
    val idRegex = s"""<div[^>]*id=["']$widgetId["']""".r
    idRegex.findFirstMatchIn(html).toSeq.flatMap { start =>
      val after = html.substring(start.start)
      val tableEnd = after.indexOf("</table>")
      val scope = if (tableEnd >= 0) after.substring(0, tableEnd) else after
      """(?s)<tr[^>]*>(.*?)</tr>""".r.findAllMatchIn(scope).flatMap { tr =>
        (tdByClass(tr.group(1), "label"), tdByClass(tr.group(1), "data")) match {
          case (Seq(label), Seq(data)) => Some((label, data))
          case _ => None
        }
      }
    }
  }

  /** Text content of the first element with the given class (the
    * `.lastupdate` stamp, `WeewxLogger.cs:56`).
    */
  def firstTextByClass(html: String, cls: String): Option[String] =
    s"""(?s)<(\\w+)[^>]*class=["'][^"']*\\b$cls\\b[^"']*["'][^>]*>(.*?)</\\1>""".r
      .findFirstMatchIn(html).map(m => textContent(m.group(2)))
}
