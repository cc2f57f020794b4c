package graft

/** Minimal JSON string quoting shared by the engine's hand-rolled JSON
  * emitters (Verify's oracle dump, Main's manifest): backslash, quote,
  * and ALL control chars (<0x20) escaped — an unescaped tab/CR/quote in
  * builder-authored SQL or a user-supplied path would make the
  * consumer's json.load fail.
  */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Inverse of [[quote]]'s escaping (input WITHOUT the surrounding
    * quotes): the log parser's string-stats bounds round-trip. */
  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n'  => b += '\n'; i += 2
          case 'r'  => b += '\r'; i += 2
          case 't'  => b += '\t'; i += 2
          case 'u' if i + 5 < s.length + 1 =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => b += other; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }
}
