package graft.util

/** Shared JSON string escaping — used by the bench JSON line, the Verify
  * oracle dump, and the CLI request payload. Escapes backslash, quote,
  * and ALL control chars (< 0x20): a tab or CR in builder-authored SQL or
  * an exception message would otherwise break a consumer's json parse. */
object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
