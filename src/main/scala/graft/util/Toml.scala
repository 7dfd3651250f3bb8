package graft.util

import graft.core.GraftError

import scala.collection.mutable

/** Minimal TOML-subset parser for catalog files — the shapes the reference
  * accepts via `tomllib` in its catalog loader
  * (`src/polars_incremental/catalog.py:100-101`, fixture
  * `tests/test_catalog.py:141-144`): `[dotted.table]` headers, bare keys,
  * basic/literal strings, integers, floats, booleans, flat arrays, `#`
  * comments. NOT a full TOML implementation (no arrays-of-tables, inline
  * tables, dates, or multi-line strings) — unsupported syntax raises a
  * [[GraftError]] naming the line instead of mis-parsing.
  */
object Toml {

  def parse(text: String): Map[String, Any] = {
    val root = mutable.LinkedHashMap.empty[String, Any]
    var current = root
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = stripComment(raw).trim
      def fail(msg: String) =
        throw new GraftError(s"TOML parse error at line ${i + 1}: $msg: $raw")
      if (line.nonEmpty) {
        if (line.startsWith("[[")) fail("arrays of tables are not supported")
        else if (line.startsWith("[")) {
          if (!line.endsWith("]")) fail("unterminated table header")
          val name = line.substring(1, line.length - 1).trim
          if (name.isEmpty) fail("empty table header")
          current = descend(root, splitDotted(name), fail)
        } else {
          val eq = line.indexOf('=')
          if (eq < 1) fail("expected key = value")
          val key = unquoteKey(line.take(eq).trim)
          if (key.isEmpty) fail("empty key")
          current(key) = parseValue(line.drop(eq + 1).trim, fail)
        }
      }
    }
    toImmutable(root)
  }

  /** Cut an unquoted `#` comment (respects strings). */
  private def stripComment(line: String): String = {
    var i = 0; var inBasic = false; var inLiteral = false
    while (i < line.length) {
      line.charAt(i) match {
        case '\\' if inBasic => i += 1 // skip escaped char
        case '"' if !inLiteral => inBasic = !inBasic
        case '\'' if !inBasic => inLiteral = !inLiteral
        case '#' if !inBasic && !inLiteral => return line.take(i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def splitDotted(name: String): Seq[String] =
    name.split('.').map(unquoteKey).toSeq

  private def unquoteKey(k: String): String = {
    val t = k.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  private def descend(root: mutable.LinkedHashMap[String, Any], path: Seq[String],
      fail: String => Nothing): mutable.LinkedHashMap[String, Any] =
    path.foldLeft(root) { (node, key) =>
      node.getOrElseUpdate(key, mutable.LinkedHashMap.empty[String, Any]) match {
        case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
        case _ => fail(s"key '$key' is both a value and a table")
      }
    }

  private val IntRe = """[+-]?[0-9][0-9_]*""".r
  private val FloatRe = """[+-]?[0-9][0-9_]*(\.[0-9][0-9_]*)?([eE][+-]?[0-9]+)?""".r

  private def parseValue(v: String, fail: String => Nothing): Any = v match {
    case "" => fail("missing value")
    case "true" => true
    case "false" => false
    case s if s.startsWith("\"") => parseBasicString(s, fail)
    case s if s.startsWith("'") =>
      if (s.length < 2 || !s.endsWith("'")) fail("unterminated literal string")
      else s.substring(1, s.length - 1)
    case s if s.startsWith("[") =>
      if (!s.endsWith("]")) fail("unterminated array (multi-line arrays unsupported)")
      else splitArray(s.substring(1, s.length - 1), fail).map(parseValue(_, fail))
    case IntRe() => v.replace("_", "").toLong
    case FloatRe(_, _) => v.replace("_", "").toDouble
    case _ => fail(s"unsupported value syntax '$v'")
  }

  private def parseBasicString(s: String, fail: String => Nothing): String = {
    val sb = new StringBuilder
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          if (i != s.length - 1) fail("trailing characters after string")
          return sb.toString
        case '\\' =>
          if (i + 1 >= s.length) fail("dangling escape")
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case 'u' =>
              if (i + 4 >= s.length) fail("short \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => fail(s"unsupported escape \\$c")
          }
        case c => sb.append(c)
      }
      i += 1
    }
    fail("unterminated string")
  }

  /** Split a flat array body on top-level commas (strings may contain
    * commas; nested arrays are unsupported). */
  private def splitArray(body: String, fail: String => Nothing): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inBasic = false; var inLiteral = false
    body.foreach {
      case c @ '\\' if inBasic => cur.append(c) // keep escape for parseValue
      case c @ '"' if !inLiteral => inBasic = !inBasic; cur.append(c)
      case c @ '\'' if !inBasic => inLiteral = !inLiteral; cur.append(c)
      case '[' if !inBasic && !inLiteral => fail("nested arrays are not supported")
      case ',' if !inBasic && !inLiteral => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def toImmutable(m: mutable.LinkedHashMap[String, Any]): Map[String, Any] =
    m.map {
      case (k, v: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
        k -> toImmutable(v)
      case (k, v) => k -> v
    }.toMap
}
