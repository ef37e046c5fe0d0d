package graft.util

/** Minimal JSON helpers shared by the driver-facing mains ([[graft.Bench]],
  * [[graft.Verify]]) — one escape implementation so the two stdout/file
  * writers can never drift (e.g. one handling control chars and the other
  * not, which would make the driver's json.load fail on builder-authored
  * SQL containing a tab). */
object Json {
  /** Escape + quote a JSON string: backslash, quote, and ALL control
    * characters (<0x20). */
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
