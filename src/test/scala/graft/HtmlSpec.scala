package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Html

/** The Weewx page extractor's entity decode: named (incl. the
  * digit-bearing &sup2;/&sup3; used in unit strings), numeric decimal
  * and hex references, and the never-throw law for malformed input.
  */
class HtmlSpec extends AnyFunSuite {

  test("entity decode: named, digit-bearing, decimal, hex") {
    assert(Html.decodeEntities("10.2&#176;C") == "10.2°C")
    assert(Html.decodeEntities("57 W/m&#178;") == "57 W/m²")
    assert(Html.decodeEntities("57 W/m&sup2;") == "57 W/m²")
    assert(Html.decodeEntities("5 m&sup3;/h") == "5 m³/h")
    assert(Html.decodeEntities("a &amp; b &lt;c&gt;") == "a & b <c>")
    assert(Html.decodeEntities("&#x2F;home") == "/home")
  }

  test("entity decode never throws: malformed refs pass through verbatim") {
    assert(Html.decodeEntities("&#99999999999;x") == "&#99999999999;x") // overflow
    assert(Html.decodeEntities("&#x110000;") == "&#x110000;") // > max code point
    assert(Html.decodeEntities("&unknown;") == "&unknown;")
    assert(Html.decodeEntities("&; && &#;") == "&; && &#;")
  }

  test("textContent strips tags then decodes") {
    assert(Html.textContent("<td class=\"data\">1010.5 mbar (   N/A)</td>")
      == "1010.5 mbar (   N/A)")
    assert(Html.textContent("<b>0.9 m/s</b> ESE (110&#176;)") == "0.9 m/s ESE (110°)")
  }
}
