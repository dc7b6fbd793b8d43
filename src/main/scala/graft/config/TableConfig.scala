package graft.config

/** Config model mirroring the reference's YAML table-config contract
  * (reference: R/load_table_from_file.R:27-68, R/create_table.R —
  * `to_schema`/`to_table`, ordered `vars` name→type map, `years` list with
  * per-year overrides and year-specific extra columns `vars_2014`, …).
  *
  * The reference resolves values with precedence
  * explicit arg > server-nested YAML > top-level YAML; [[TableConfig.resolve]]
  * reproduces that hierarchy.
  */
final case class ColumnSpec(name: String, sqlType: String)

final case class TableConfig(
    toSchema: String = "default",
    toTable: String = "",
    vars: Seq[ColumnSpec] = Nil,
    years: Seq[Int] = Nil,
    yearVars: Map[Int, Seq[ColumnSpec]] = Map.empty,
    filePath: Map[String, String] = Map.empty, // "overall" or year → path
    fieldTerm: Map[String, String] = Map.empty,
    rowTerm: Map[String, String] = Map.empty,
    firstRow: Int = 2,
    dateVar: Option[String] = None,
    indexName: Option[String] = None,
    indexType: String = "ccs", // ccs = clustered columnstore, cl = clustered
    indexVars: Seq[String] = Nil) {

  /** All columns for a given year: shared vars + year-specific extras. */
  def varsForYear(year: Int): Seq[ColumnSpec] =
    vars ++ yearVars.getOrElse(year, Nil)

  /** Union of columns across all years, shared vars first, preserving
    * first-seen order (reference: load_table_from_file.R:596-617).
    */
  def allVars: Seq[ColumnSpec] = {
    val extra = years.flatMap(y => yearVars.getOrElse(y, Nil))
    (vars ++ extra).foldLeft(Vector.empty[ColumnSpec]) { (acc, c) =>
      if (acc.exists(_.name == c.name)) acc else acc :+ c
    }
  }
}

object TableConfig {

  /** Reference-style value resolution: explicit > server-scoped > global. */
  def resolve[A](explicit: Option[A], serverScoped: Option[A],
                 global: Option[A]): Option[A] =
    explicit.orElse(serverScoped).orElse(global)

  /** Parse the YAML subset the reference configs actually use: flat
    * `key: value` pairs, one level of nesting (server blocks, year blocks,
    * `vars` maps), and simple lists. Not a general YAML parser — just the
    * contract in load_table_from_file.R:27-68.
    */
  def parseYaml(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      .map(_.replaceAll("#.*$", ""))
      .filter(_.trim.nonEmpty)
      .toVector

    def parseBlock(from: Int, indent: Int): (Map[String, Any], Int) = {
      var out: Map[String, Any] = scala.collection.immutable.VectorMap.empty
      var i = from
      while (i < lines.length) {
        val line = lines(i)
        val ind = line.takeWhile(_ == ' ').length
        if (ind < indent) return (out, i)
        val t = line.trim
        val colon = t.indexOf(':')
        if (colon < 0) {
          // bare list item under previous key
          i += 1
        } else {
          val key = t.substring(0, colon).trim
          val value = t.substring(colon + 1).trim
          if (value.nonEmpty) {
            out += key -> value
            i += 1
          } else {
            // nested block or list
            val childLines = Iterator.from(i + 1)
              .takeWhile(j => j < lines.length &&
                lines(j).takeWhile(_ == ' ').length > ind)
              .toVector
            if (childLines.nonEmpty &&
              !lines(childLines.head).trim.contains(":")) {
              out += key -> childLines.map(j => lines(j).trim.stripPrefix("- ").trim)
              i = childLines.last + 1
            } else {
              val (child, next) = parseBlock(i + 1,
                if (childLines.nonEmpty) lines(childLines.head).takeWhile(_ == ' ').length
                else ind + 1)
              out += key -> child
              i = next
            }
          }
        }
      }
      (out, i)
    }
    parseBlock(0, 0)._1
  }

  /** Build a TableConfig from a parsed YAML map (shared-vars style). */
  def fromYaml(text: String): TableConfig = {
    val m = parseYaml(text)
    def str(k: String): Option[String] = m.get(k).collect { case s: String => s }
    val vars = m.get("vars") match {
      case Some(vm: Map[String, Any] @unchecked) =>
        vm.toSeq.map { case (k, v) => ColumnSpec(k, v.toString) }
      case _ => Nil
    }
    val years = m.get("years") match {
      case Some(ys: Seq[String] @unchecked) => ys.map(_.trim.toInt)
      case Some(s: String) => Seq(s.trim.toInt)
      case _ => Nil
    }
    val yearVars = years.flatMap { y =>
      m.get(s"vars_$y") match {
        case Some(vm: Map[String, Any] @unchecked) =>
          Some(y -> vm.toSeq.map { case (k, v) => ColumnSpec(k, v.toString) })
        case _ => None
      }
    }.toMap
    TableConfig(
      toSchema = str("to_schema").getOrElse("default"),
      toTable = str("to_table").getOrElse(""),
      vars = vars,
      years = years,
      yearVars = yearVars,
      firstRow = str("first_row").map(_.toInt).getOrElse(2),
      dateVar = str("date_var"),
      indexName = str("index_name"),
      indexType = str("index_type").getOrElse("ccs"),
      indexVars = m.get("index_vars") match {
        case Some(vs: Seq[String] @unchecked) => vs
        case _ => Nil
      })
  }
}
