package graft.sink

/** Minimal recursive-descent JSON parser for the engine's own metadata
  * sidecars (snapshots, refs, partition/file stats). Replaces the
  * earlier regex-shape parsers: a regex anchored on structural
  * characters is only correct while every writer escapes those
  * characters perfectly — a real tokenizer makes the reader correct for
  * ALL legal JSON, so writer and reader no longer have to agree on an
  * escaping convention beyond the JSON standard itself.
  *
  * Deliberately tiny (no dependency, no reflection): objects, arrays,
  * strings with full escape handling (including \uXXXX), numbers kept
  * as raw text (callers choose Long vs Double — ids and timestamps must
  * not round-trip through floating point), booleans, null. Throws
  * [[MetadataJson.ParseException]] with the byte offset on malformed
  * input — corrupted metadata must fail loudly, never half-parse.
  */
object MetadataJson {

  sealed trait JValue {
    def asObj: Map[String, JValue] = this match {
      case JObj(m) => m
      case other => throw ParseException(s"expected object, got $other", -1)
    }
    def asArr: Seq[JValue] = this match {
      case JArr(vs) => vs
      case other => throw ParseException(s"expected array, got $other", -1)
    }
    def asStr: String = this match {
      case JStr(s) => s
      case other => throw ParseException(s"expected string, got $other", -1)
    }
    def asLong: Long = this match {
      case JNum(raw) => raw.toLong
      case other => throw ParseException(s"expected number, got $other", -1)
    }
    def asBool: Boolean = this match {
      case JBool(b) => b
      case other => throw ParseException(s"expected boolean, got $other", -1)
    }
  }
  final case class JObj(fields: Map[String, JValue]) extends JValue
  final case class JArr(values: Seq[JValue]) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JNum(raw: String) extends JValue
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  final case class ParseException(msg: String, offset: Int)
    extends RuntimeException(
      if (offset >= 0) s"metadata JSON parse error at offset $offset: $msg"
      else s"metadata JSON error: $msg")

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) throw ParseException("trailing content after JSON value", p.pos)
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length

    def skipWs(): Unit = {
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\t')) pos += 1
    }

    private def fail(msg: String): Nothing = throw ParseException(msg, pos)

    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def lit(word: String): Unit = {
      if (!s.regionMatches(pos, word, 0, word.length)) fail(s"expected '$word'")
      pos += word.length
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObj(Map.empty) }
      val b = Map.newBuilder[String, JValue]
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c => fail(s"expected ',' or '}' in object, got '$c'")
        }
      }
      JObj(b.result())
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArr(Nil) }
      val b = Seq.newBuilder[JValue]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case c => fail(s"expected ',' or ']' in array, got '$c'")
        }
      }
      JArr(b.result())
    }

    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(pos)
        if (c == '"') { pos += 1; return b.toString }
        else if (c == '\\') {
          pos += 1
          if (atEnd) fail("unterminated escape")
          s.charAt(pos) match {
            case '"'  => b.append('"'); pos += 1
            case '\\' => b.append('\\'); pos += 1
            case '/'  => b.append('/'); pos += 1
            case 'b'  => b.append('\b'); pos += 1
            case 'f'  => b.append('\f'); pos += 1
            case 'n'  => b.append('\n'); pos += 1
            case 'r'  => b.append('\r'); pos += 1
            case 't'  => b.append('\t'); pos += 1
            case 'u' =>
              if (pos + 4 >= s.length) fail("truncated \\u escape")
              val hex = s.substring(pos + 1, pos + 5)
              // strictly 4 hex DIGITS: parseInt would also accept sign
              // chars ("+1aF") and throw NumberFormatException (not
              // ParseException) on junk — and callers that degrade on
              // ParseException (stats sidecars are never a correctness
              // input) must see every malformed input as a parse error
              if (!hex.forall(c => (c >= '0' && c <= '9') ||
                  (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
                fail(s"invalid \\u escape '\\u$hex'")
              b.append(Integer.parseInt(hex, 16).toChar)
              pos += 5
            case e => fail(s"unknown escape '\\$e'")
          }
        } else { b.append(c); pos += 1 }
      }
      throw new IllegalStateException("unreachable")
    }

    private def num(): JNum = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && {
        val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-'
      }) pos += 1
      if (pos == start) fail("expected number")
      JNum(s.substring(start, pos))
    }
  }
}
