package graft

/** The ONE JSON string-literal escaper behind every hand-assembled JSON
  * surface (oracle dump, REST responses, CommonCrawl records): named
  * escapes for the common controls, \\uXXXX for the rest — keeping one
  * implementation means an escaping fix can't silently miss a sink. */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
