package graft

/** Minimal JSON string rendering shared by the driver-contract dump
  * ([[Verify]]) and the serving layer ([[Serve]]) — one copy of the
  * escaping rules: backslash, quote, and ALL control chars (< 0x20); an
  * unescaped tab or CR in builder-authored SQL would make a consumer's
  * `json.load` fail downstream. */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
