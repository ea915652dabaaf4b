package graft.pipeline

/** RTF text extraction (Microsoft RTF 1.9 spec) — the third classic
  * office format next to [[OfficeText]]'s DOCX/ODT: a plain
  * control-word stream, no container. One single-pass walk:
  *
  *  - groups `{...}` push/pop state (skip flag + the group's `\ucN`);
  *  - control words: `\par`/`\line` → `\n`, `\tab` → `\t`, `\ucN` sets
  *    the per-group unicode fallback length, `\uN` emits the UTF-16
  *    code unit (negative N is the signed-16-bit form, +65536;
  *    surrogate pairs arrive as two `\u`) and then SKIPS the next
  *    `uc` fallback characters (plain chars or `\'xx` each count 1);
  *  - `\'xx` is a windows-1252 byte ([[CharsetOps.decode1252]] — the
  *    WHATWG total mapping);
  *  - control symbols `\\ \{ \}` are literals; `\~` NBSP, `\-`/`\_`
  *    soft hyphen forms are dropped;
  *  - destination groups that hold no document text (`fonttbl`,
  *    `colortbl`, `stylesheet`, `info`, `pict`, …) and every `{\*`
  *    ignorable destination are skipped whole;
  *  - raw CR/LF in the source are ignored per spec (authors use them
  *    for line wrapping; text newlines are `\par`).
  *
  * Bounded and total (malformed → best-effort text, never a thrown
  * task). Surfaced through the same `office_kind`/`office_text`
  * expressions ([[OfficeText]] routes `{\rtf` here), so RTF extraction
  * rides the identical scan-stage shape. */
object RtfText {

  private val SkipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "generator", "xmlnstbl", "filetbl", "revtbl", "listtable",
    "listoverridetable", "header", "footer", "operator")

  def isRtf(s: String): Boolean = s != null && s.startsWith("{\\rtf")

  /** Extracted plain text, or null when not RTF. */
  def extract(src: String): String = {
    if (!isRtf(src)) return null
    val sb = new java.lang.StringBuilder()
    // group state stacks
    var skip = false
    var uc = 1
    var stack = List.empty[(Boolean, Int)]
    var pendSkip = 0 // fallback chars to swallow after \uN
    var i = 0
    val n = src.length
    try {
      while (i < n) {
        val c = src.charAt(i)
        c match {
          case '{' =>
            stack = (skip, uc) :: stack; i += 1
          case '}' =>
            stack match {
              case (s0, u0) :: rest => skip = s0; uc = u0; stack = rest
              case Nil => // unbalanced: keep walking
            }
            i += 1
          case '\\' if i + 1 < n =>
            val d = src.charAt(i + 1)
            if (d == '\'' && i + 3 < n) { // \'xx hex byte
              val hex = src.substring(i + 2, i + 4)
              i += 4
              if (pendSkip > 0) pendSkip -= 1
              else if (!skip) {
                try sb.append(CharsetOps.decode1252(
                  Array(Integer.parseInt(hex, 16).toByte)))
                catch { case _: NumberFormatException => }
              }
            } else if (!Character.isLetter(d)) { // control symbol
              i += 2
              if (d == '*') skip = true // ignorable destination
              else if (pendSkip > 0 && (d == '\\' || d == '{' || d == '}'))
                pendSkip -= 1 // escaped literals count as one char
              else if (!skip && pendSkip == 0) d match {
                case '\\' | '{' | '}' => sb.append(d)
                case '~' => sb.append(' ')
                case _ => // \- \_ \: etc: no text
              }
            } else { // control word
              var j = i + 1
              while (j < n && Character.isLetter(src.charAt(j))) j += 1
              val word = src.substring(i + 1, j)
              var neg = false
              var num = -1
              if (j < n && (src.charAt(j) == '-' || src.charAt(j).isDigit)) {
                if (src.charAt(j) == '-') { neg = true; j += 1 }
                num = 0
                while (j < n && src.charAt(j).isDigit) {
                  num = math.min(num * 10 + (src.charAt(j) - '0'), 1 << 24)
                  j += 1
                }
                if (neg) num = -num
              }
              if (j < n && src.charAt(j) == ' ') j += 1 // delimiter space
              i = j
              word match {
                case "u" =>
                  if (!skip && pendSkip == 0) {
                    val cu = if (num < 0) num + 65536 else num
                    if (cu >= 0 && cu <= 0xffff) sb.append(cu.toChar)
                  }
                  if (!skip) pendSkip = uc
                case "uc" => uc = math.max(num, 0)
                case "par" | "line" =>
                  if (!skip && pendSkip == 0) sb.append('\n')
                case "tab" =>
                  if (pendSkip > 0) pendSkip -= 1 // \tab is a character
                  else if (!skip) sb.append('\t')
                case w if SkipDests.contains(w) => skip = true
                case _ => // formatting word: no text
              }
            }
          case '\r' | '\n' => i += 1 // raw newlines are not text
          case ch =>
            i += 1
            if (pendSkip > 0) pendSkip -= 1
            else if (!skip) sb.append(ch)
        }
      }
      sb.toString
    } catch { case _: Exception => null }
  }

  /** Test/bench synthesis: the corpus as RTF byte documents (pure
    * ASCII on the wire — non-ASCII travels as `\uN?`). */
  def wrapCorpus(spark: org.apache.spark.sql.SparkSession,
                 docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, encode(if (t == null) "" else t)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      }
      .toDF("doc_id", "bytes")
  }

  /** Minimal well-formed RTF: ASCII raw; `\ { }` escaped; tab/newline
    * as control words; every non-ASCII char as signed-16-bit `\uN?`
    * (surrogate pairs as two `\u`) under `\uc1` with '?' fallback. */
  def encode(s: String): String = {
    val sb = new java.lang.StringBuilder("{\\rtf1\\ansi\\uc1 ")
    val t = Option(s).getOrElse("")
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '{' => sb.append("\\{")
        case '}' => sb.append("\\}")
        case '\t' => sb.append("\\tab ")
        case '\n' => sb.append("\\par ")
        case ch if ch < 0x80 => sb.append(ch)
        case ch =>
          val v = ch.toInt
          sb.append("\\u").append(if (v > 32767) v - 65536 else v).append('?')
      }
      i += 1
    }
    sb.append('}').toString
  }
}
