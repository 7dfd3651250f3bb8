package graft

import graft.functions.{HtmlCodec, HtmlFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** HtmlCodec tag-tokenizer and block-classifier edge cases (the
  * d_html_extract oracle pins the composed behavior on planted markup;
  * these pin the tokenizer's corners individually). */
class HtmlExtractSuite extends SparkSpec {

  private def x(html: String, minWords: Int = 3,
      maxLink: Double = 0.4): String =
    HtmlCodec.extract(UTF8String.fromString(html), minWords, maxLink).toString

  test("script and style content is raw text — a '<' inside is not markup") {
    assert(x("<p>keep this prose line</p>" +
      "<script>if (1 < 2) { var x = \"</p>fake\"; }</script>" +
      "<p>and this second line</p>")
      == "keep this prose line\nand this second line")
    assert(x("<style>p { color: red } </style><p>only the prose stays</p>")
      == "only the prose stays")
  }

  test("comments and attributes (quote-aware, '>' inside quotes) skip") {
    assert(x("<!-- <p>ghost block</p> --><p>real block stays here</p>")
      == "real block stays here")
    assert(x("<p data-x='a > b' title=\"1 > 0\">attr gt does not close</p>")
      == "attr gt does not close")
  }

  test("entities decode: named, numeric, hex; unknown stays literal") {
    assert(x("<p>copy &amp; paste &lt;ok&gt; &#65;B &#x43;D</p>")
      == "copy & paste <ok> AB CD")
    assert(x("<p>unknown &copy; entity stays put</p>")
      == "unknown &copy; entity stays put")
  }

  test("link density: consecutive anchors count as separate link words") {
    // 2 link words of 4 = 0.5 > 0.4 -> dropped even though the anchor
    // texts are adjacent (the concatenation undercount would keep it)
    assert(x("<p>body text stays here</p>" +
      "<div><a>Terms</a><a>Privacy</a> (c) 2024</div>")
      == "body text stays here")
    // 1 link word of 4 = 0.25 <= 0.4 -> kept
    assert(x("<div>see the <a>docs</a> page</div>", minWords = 3)
      == "see the docs page")
  }

  test("minWords gates short chrome; inline tags neither split nor count") {
    assert(x("<title>two words</title><p>three words here</p>")
      == "three words here")
    // inline <b> splits the text node but not the word
    assert(x("<p>a <b>bo</b>ld word sits here</p>", minWords = 3)
      == "a bold word sits here")
  }

  test("whitespace normalizes; empty and all-whitespace blocks vanish") {
    assert(x("<p>  spaced   out\n\ttokens  </p>") == "spaced out tokens")
    assert(x("<div>   </div><p>real content block</p><div></div>")
      == "real content block")
  }

  test("unclosed constructs do not loop or throw") {
    assert(x("<p>trailing open tag <") == "trailing open tag")
    assert(x("<script>never closed") == "")
    assert(x("<!-- never closed") == "")
    assert(x("plain text with no markup at all")
      == "plain text with no markup at all")
  }

  test("column wrapper: map-only over a DataFrame, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "<p>one real block here</p><nav><a>x</a> <a>y</a></nav>"),
      (2L, null.asInstanceOf[String])).toDF("id", "html")
    val got = df.select(col("id"),
      HtmlFunctions.htmlExtract(col("html")).as("c")).orderBy("id").collect()
    assert(got(0).getString(1) == "one real block here")
    assert(got(1).isNullAt(1))
  }
}
