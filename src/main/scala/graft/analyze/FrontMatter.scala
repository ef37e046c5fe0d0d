package graft.analyze

/** YAML front-matter handling (reference `src/utils/yaml_front_matter.py:7-47`).
  *
  * A document starting with a `---` line followed by a closing `---` line has
  * that block stripped before chunking; documents without front matter pass
  * through unchanged (reference `src/utils/yaml_front_matter.py:24-25`).
  */
object FrontMatter {
  // (?s) so `.` spans lines; non-greedy body; tolerate trailing spaces after ---
  private val Pattern = "(?s)^---\\s*\\n(.*?)\\n---\\s*\\n".r

  /** SQL-side equivalent regex, usable with `regexp_replace`. */
  val regex: String = "(?s)^---\\s*\\n.*?\\n---\\s*\\n"

  /** Strip leading YAML front matter, if present. */
  def strip(text: String): String =
    Pattern.findPrefixMatchOf(text).map(m => text.substring(m.end)).getOrElse(text)

  /** Return (frontMatterBody, rest); front matter is None when absent
    * (reference `src/utils/yaml_front_matter.py:28-47`). */
  def split(text: String): (Option[String], String) =
    Pattern.findPrefixMatchOf(text) match {
      case Some(m) => (Some(m.group(1)), text.substring(m.end))
      case None    => (None, text)
    }

  /** Number of lines the stripped front matter occupied (for line-number
    * bookkeeping in the chunker). 0 when no front matter. */
  def strippedLineCount(text: String): Int =
    Pattern.findPrefixMatchOf(text)
      .map(m => text.substring(0, m.end).count(_ == '\n'))
      .getOrElse(0)
}
