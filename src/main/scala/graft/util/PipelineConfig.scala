package graft.util

import scala.io.Source

/** Config-file loading for the pipeline — the reference drives paths,
  * quality thresholds, spark conf and table lists from
  * configs/pipeline_config.yml; this loads the same file shape.
  *
  * Parses the YAML subset that config file actually uses (nested
  * `key: value` mappings and `- item` lists, `#` comments, quoted strings)
  * with no external dependency: the build has zero egress, and a full YAML
  * engine for a 4-section config is the wrong trade. Keys flatten to
  * dotted paths: `quality_thresholds.null_rate_default -> "0.001"`,
  * `tables.gold -> Seq("fct_orders", ...)`.
  */
final case class PipelineConfig(values: Map[String, String],
                                lists: Map[String, Seq[String]]) {
  def str(key: String): String =
    values.getOrElse(key, sys.error(s"config key missing: $key"))
  def str(key: String, default: String): String = values.getOrElse(key, default)
  def double(key: String, default: Double): Double =
    values.get(key).map(_.toDouble).getOrElse(default)
  def int(key: String, default: Int): Int =
    values.get(key).map(_.toInt).getOrElse(default)
  def list(key: String): Seq[String] = lists.getOrElse(key, Nil)
}

object PipelineConfig {

  def load(path: String): PipelineConfig = {
    val src = Source.fromFile(path)(scala.io.Codec.UTF8)
    try parse(src.getLines().toList) finally src.close()
  }

  private[graft] def parse(lines: Seq[String]): PipelineConfig = {
    val values = Map.newBuilder[String, String]
    val lists = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    // stack of (indent, key) giving the path to the current nesting level
    var stack = List.empty[(Int, String)]
    for (raw <- lines) {
      val noComment = stripComment(raw)
      if (noComment.trim.nonEmpty) {
        // YAML forbids tabs in indentation; without this check a
        // tab-indented file would silently parse every key at indent 0,
        // flattening the nesting into wrong dotted keys.
        if (noComment.takeWhile(c => c == ' ' || c == '\t').contains('\t'))
          sys.error(s"tab in indentation (YAML requires spaces): $raw")
        val indent = noComment.takeWhile(_ == ' ').length
        val line = noComment.trim
        stack = stack.dropWhile(_._1 >= indent)
        val prefix = stack.reverse.map(_._2)
        if (line.startsWith("- ")) {
          val key = prefix.mkString(".")
          lists(key) = lists.getOrElse(key, Vector.empty) :+ unquote(line.drop(2).trim)
        } else line.indexOf(':') match {
          case -1 => sys.error(s"unparseable config line: $raw")
          case i =>
            val key = line.take(i).trim
            val value = line.drop(i + 1).trim
            if (value.isEmpty) stack = (indent, key) :: stack
            else values += ((prefix :+ key).mkString(".") -> unquote(value))
        }
      }
    }
    PipelineConfig(values.result(), lists.toMap)
  }

  /** Strip a trailing `# comment` — only when the `#` is unquoted and
    * preceded by whitespace or starts the line (YAML comment rule; a bare
    * `#` inside a value like `/raw#v2` is content). */
  private def stripComment(line: String): String = {
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"') inQuote = !inQuote
      if (c == '#' && !inQuote && (i == 0 || line(i - 1) == ' ' || line(i - 1) == '\t'))
        return line.take(i)
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
    else s
}
