package graft

/** Shared JSON string escaping for the harness artifacts (Verify's
  * oracle_sql.json/_manifest.json and Bench's metric line). Escapes
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL or an exception message would otherwise make
  * the driver's json.load fail and silently zero a round's artifact.
  */
object JsonOut {
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
