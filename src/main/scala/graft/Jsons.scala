package graft

/** JSON string escaping shared by the Bench and Verify mains — one
  * copy so an escaping fix can never apply to one emitted file and not
  * the other. Escapes backslash, quote, and ALL control chars (<0x20):
  * a tab or CR in builder-authored SQL would otherwise make the
  * driver's json.load fail and silently zero the round's correctness.
  */
private[graft] object Jsons {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
