package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd main-content extraction from HTML — the step UPSTREAM of
  * every text operator in a crawl pipeline: corpora arrive as markup,
  * and quality/dedup/tokenization all assume the chrome (navigation,
  * footers, script payloads) is already gone.
  *
  * JDK-only tag tokenizer (no parser library, no regex) + block scoring
  * — the public Boilerpipe (Kohlschütter et al., WSDM'11) / jusText
  * (Pomikálek 2011) design reduced to its deterministic core:
  *  - a single left-to-right scan splits the document into BLOCKS at
  *    block-level tags (p, div, h1-h6, li, nav, ...); inline tags (a, b,
  *    span, ...)
  *    do not split; `<script>`/`<style>` element CONTENT is skipped
  *    outright (a raw `<` inside them is content, not markup);
  *    comments and tag attributes (quote-aware) are skipped; the five
  *    core named entities and numeric character references decode.
  *  - each block classifies KEEP when it has at least `minWords`
  *    whitespace words AND its link density (words inside `<a>` /
  *    words) is at most `maxLinkDensity` — short chrome and link lists
  *    (navigation, footers, related-article boxes) drop, prose stays.
  *    That is jusText's length+link-density skeleton without the
  *    language-dependent stopword test, so the rule is exactly
  *    reproducible by an oracle on planted markup.
  *  - kept blocks emit whitespace-normalized (words joined by one
  *    space), joined by `\n` in document order.
  *
  * One pass, O(bytes), zero allocation beyond the builders — a pure
  * map expression; at 100 TB extraction streams through the scan with
  * no shuffle. */
object HtmlCodec {
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "br", "hr",
      "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl", "dt",
      "dd", "table", "thead", "tbody", "tfoot", "tr", "td", "th",
      "nav", "header", "footer", "article", "section", "aside", "main",
      "blockquote", "pre", "form", "fieldset", "figure", "figcaption",
      "address", "center").foreach(s.add)
    s
  }

  /** Extract main content (called reflectively from generated java). */
  def extract(html: UTF8String, minWords: Int,
      maxLinkDensity: Double): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    val anchorText = new java.lang.StringBuilder
    var anchorDepth = 0
    var i = 0

    def flush(): Unit = {
      val words = splitWords(block)
      if (words.length >= minWords) {
        val linkWords = splitWords(anchorText).length
        if (linkWords.toDouble / words.length <= maxLinkDensity) {
          if (out.length > 0) out.append('\n')
          var k = 0
          while (k < words.length) {
            if (k > 0) out.append(' ')
            out.append(words(k))
            k += 1
          }
        }
      }
      block.setLength(0)
      anchorText.setLength(0)
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // tag: [/]name ...attrs... [/] > with quote-aware attr scan
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          var quote: Char = 0
          var selfClosing = false
          while (j < n && (quote != 0 || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '/') selfClosing = true
            else if (!Character.isWhitespace(cj) && cj != '=') selfClosing = false
            j += 1
          }
          i = if (j < n) j + 1 else n
          if (name == "script" || name == "style") {
            if (!closing && !selfClosing) {
              // raw-text element: everything to the matching close tag is
              // content (a '<' inside is NOT markup) and none of it is text
              val close = "</" + name
              var k = i
              while (k >= 0 && k <= n - close.length &&
                  !s.regionMatches(true, k, close, 0, close.length)) k += 1
              if (k > n - close.length) k = -1
              if (k < 0) i = n
              else {
                val gt = s.indexOf('>', k)
                i = if (gt < 0) n else gt + 1
              }
            }
          } else if (name == "a") {
            if (closing) {
              if (anchorDepth > 0) anchorDepth -= 1
              // separate consecutive anchors' text: "<a>Terms</a><a>Privacy</a>"
              // is TWO link words, not one concatenated token
              anchorText.append(' ')
            } else if (!selfClosing) anchorDepth += 1
          } else if (BlockTags.contains(name)) {
            flush()
          }
          // all other inline tags: no block break, no text
        }
      } else {
        // text node up to the next tag, entities decoded in-place
        val next = s.indexOf('<', i)
        val end = if (next < 0) n else next
        while (i < end) {
          val tc = s.charAt(i)
          if (tc == '&') {
            val semi = s.indexOf(';', i + 1)
            if (semi > i && semi - i <= 10) {
              val ent = s.substring(i + 1, semi)
              val decoded = decodeEntity(ent)
              if (decoded != null) {
                block.append(decoded)
                if (anchorDepth > 0) anchorText.append(decoded)
                i = semi + 1
              } else {
                block.append(tc)
                if (anchorDepth > 0) anchorText.append(tc)
                i += 1
              }
            } else {
              block.append(tc)
              if (anchorDepth > 0) anchorText.append(tc)
              i += 1
            }
          } else {
            block.append(tc)
            if (anchorDepth > 0) anchorText.append(tc)
            i += 1
          }
        }
      }
    }
    flush()
    UTF8String.fromString(out.toString)
  }

  private def decodeEntity(ent: String): String = ent match {
    case "amp" => "&"
    case "lt" => "<"
    case "gt" => ">"
    case "quot" => "\""
    case "apos" => "'"
    case "nbsp" => " "
    case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
      try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
      catch { case _: Exception => null }
    case _ if ent.startsWith("#") =>
      try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
      catch { case _: Exception => null }
    case _ => null
  }

  private def splitWords(sb: java.lang.StringBuilder): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = sb.length
    while (i < n) {
      while (i < n && Character.isWhitespace(sb.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(sb.charAt(i))) i += 1
      if (i > start) out += sb.substring(start, i)
    }
    out.toArray
  }
}

/** html string → extracted main-content text (see [[HtmlCodec]]). */
case class HtmlExtractExpr(child: Expression, minWords: Int,
    maxLinkDensity: Double) extends UnaryExpression {
  require(minWords >= 1, s"minWords must be >= 1, got $minWords")
  require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
    s"maxLinkDensity must be in [0,1], got $maxLinkDensity")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_extract requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HtmlCodec.extract(input.asInstanceOf[UTF8String], minWords, maxLinkDensity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HtmlCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
         |  $helper.extract($a, $minWords, $maxLinkDensity);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)

  override def prettyName: String = "html_extract"
}

object HtmlFunctions {
  /** Codegen'd Boilerpipe/jusText-style main-content extraction. */
  def htmlExtract(html: Column, minWords: Int = 3,
      maxLinkDensity: Double = 0.4): Column =
    Bridge.column(HtmlExtractExpr(Bridge.expression(html), minWords,
      maxLinkDensity))
}
