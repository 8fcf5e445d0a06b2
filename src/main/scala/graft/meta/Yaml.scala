package graft.meta

/** Minimal YAML-subset parser covering the shapes the reference's
  * metadata files use (see /root/reference/bronze/tickers/tickers.yml:1-145,
  * /root/reference/bronze/job_metadata.yml:1-28): block maps, block lists
  * of maps (including lists indented at the same level as their parent
  * key), quoted and plain scalars, full-line comments. No dependency —
  * the offline coursier cache carries no YAML library (SURVEY.md §7.5).
  */
object Yaml {

  sealed trait Value {
    def asMap: Map[String, Value] = this match {
      case YMap(entries) => entries.toMap
      case other => sys.error(s"expected map, got $other")
    }
    def asList: Seq[Value] = this match {
      case YList(items) => items
      case other => sys.error(s"expected list, got $other")
    }
    def asString: String = this match {
      case YStr(s) => s
      case other => sys.error(s"expected scalar, got $other")
    }
    def get(key: String): Option[Value] = this match {
      case YMap(entries) => entries.collectFirst { case (k, v) if k == key => v }
      case _ => None
    }
    def str(key: String): Option[String] = get(key).map(_.asString)
    def bool(key: String): Boolean = str(key).exists(_.trim.equalsIgnoreCase("true"))
    def list(key: String): Seq[Value] = get(key).map(_.asList).getOrElse(Nil)
  }
  /** Insertion-ordered map. */
  final case class YMap(entries: Seq[(String, Value)]) extends Value
  final case class YList(items: Seq[Value]) extends Value
  final case class YStr(value: String) extends Value

  private final case class Line(indent: Int, text: String)

  def parse(source: String): Value = {
    val lines = source.linesIterator.toSeq
      .map(l => l.replace("\t", "  "))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .map { l =>
        val indent = l.takeWhile(_ == ' ').length
        Line(indent, l.trim)
      }
    if (lines.isEmpty) YMap(Nil)
    else parseBlock(lines)
  }

  def parseFile(path: String): Value =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  private def parseBlock(lines: Seq[Line]): Value = {
    val base = lines.head.indent
    if (lines.head.text.startsWith("- ") || lines.head.text == "-") parseList(lines, base)
    else if (lines.length == 1 && isScalar(lines.head.text)) YStr(unquote(lines.head.text))
    else parseMap(lines, base)
  }

  /** A lone block line with no `key:` shape is a scalar — the list-of-
    * scalars case (`- 'Open'`). Quoted text is always scalar; unquoted
    * text only if it carries no colon (a colon-bearing unquoted scalar
    * like a URL must be quoted in the source).
    */
  private def isScalar(text: String): Boolean =
    text.head == '\'' || text.head == '"' || !text.contains(':')

  private def parseList(lines: Seq[Line], base: Int): Value = {
    val items = Seq.newBuilder[Value]
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      require(l.indent == base && (l.text.startsWith("- ") || l.text == "-"),
        s"malformed list item: '${l.text}'")
      // The item's own content starts after "- "; treat it as a line
      // indented two columns past the dash, then absorb deeper lines.
      val headText = l.text.drop(2).trim
      val children = Seq.newBuilder[Line]
      if (headText.nonEmpty) children += Line(base + 2, headText)
      i += 1
      while (i < lines.length && lines(i).indent > base) {
        children += lines(i)
        i += 1
      }
      val childLines = children.result()
      items += (if (childLines.isEmpty) YStr("") else parseBlock(childLines))
    }
    YList(items.result())
  }

  private def parseMap(lines: Seq[Line], base: Int): Value = {
    val entries = Seq.newBuilder[(String, Value)]
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      require(l.indent == base, s"inconsistent indentation at '${l.text}'")
      val colon = l.text.indexOf(':')
      require(colon > 0, s"expected 'key:' in '${l.text}'")
      val key = unquote(l.text.take(colon).trim)
      val inline = l.text.drop(colon + 1).trim
      i += 1
      if (inline.nonEmpty) {
        entries += key -> YStr(unquote(inline))
      } else {
        // Nested block: deeper-indented lines, or a list whose dashes
        // sit at the key's own indent (YAML allows both; the reference's
        // job_metadata.yml uses the same-indent form).
        val children = Seq.newBuilder[Line]
        val listAtSameIndent =
          i < lines.length && lines(i).indent == base && lines(i).text.startsWith("- ")
        while (i < lines.length &&
          (lines(i).indent > base ||
            (listAtSameIndent && lines(i).indent == base && lines(i).text.startsWith("- ")))) {
          children += lines(i)
          i += 1
        }
        val childLines = children.result()
        entries += key -> (if (childLines.isEmpty) YStr("") else parseBlock(childLines))
      }
    }
    YMap(entries.result())
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s
}
