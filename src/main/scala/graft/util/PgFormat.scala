package graft.util

/** Output-formatting helpers for CLI parity (SURVEY.md §7.3): Postgres'
  * pg_size_pretty, jsonb_pretty-style indentation, and quote_ident. */
object PgFormat {

  /** pg_size_pretty semantics: bytes under 10×unit step to the next unit,
    * halves round to even-ish via Postgres' (size + half) >> shift walk.
    * Matches PG's doc'd behavior: 10239 bytes, 10 kB, 10 MB, ... */
  def pgSizePretty(bytes: Long): String = {
    val units = Seq("bytes", "kB", "MB", "GB", "TB", "PB")
    var size = bytes
    var i = 0
    while (i < units.length - 1 && math.abs(size) >= 10240) {
      size = (size + 512) >> 10 // PG rounds at half-unit before shifting
      i += 1
    }
    s"$size ${units(i)}"
  }

  /** quote_ident semantics: quote unless a safe lowercase identifier;
    * embedded quotes double. Used wherever the engine interpolates
    * identifiers into SQL (the reference's injection guard — format('%I')
    * in sql/V000010…sql:23,40). */
  def quoteIdent(ident: String): String =
    if (ident.matches("[a-z_][a-z0-9_]*")) ident
    else "\"" + ident.replace("\"", "\"\"") + "\""

  /** Pretty-print a JSON text with 4-space indentation, jsonb_pretty
    * style (key order preserved as given — our emitters construct
    * structs in deterministic field order, SURVEY.md §7.4 risk 1). */
  def jsonPretty(json: String): String = {
    val out = new StringBuilder
    var indent = 0
    var inStr = false
    var esc = false
    def nl(): Unit = { out += '\n'; out ++= "    " * indent }
    json.foreach { c =>
      if (inStr) {
        out += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; out += c
        case '{' | '[' => out += c; indent += 1; nl()
        case '}' | ']' => indent -= 1; nl(); out += c
        case ',' => out += c; nl()
        case ':' => out ++= ": "
        case w if w.isWhitespace => ()
        case _ => out += c
      }
    }
    out.result()
  }
}
