package graft.meta

import org.apache.spark.sql.types._

/** One declared expectation on a column — mirrors the reference's
  * per-column `tests` entries (/root/reference/silver/prices/prices.yml:7-10,41-81;
  * flattened by lib/checker.py:68-88).
  */
final case class TestSpec(
    testType: String,
    testName: String,
    kwargs: Map[String, String],
    listKwargs: Map[String, Seq[String]] = Map.empty)

/** Per-column metadata beyond the Spark type (SURVEY.md §1.2):
  * key / date_predicate / mandate / tests, which StructType can't carry.
  */
final case class ColumnMeta(
    name: String,
    dataType: DataType,
    nullable: Boolean,
    key: Boolean,
    datePredicate: Boolean,
    mandate: Option[String],
    tests: Seq[TestSpec])

/** A table's full declared metadata: the YAML `schema:` list parsed to
  * typed columns. Mirrors lib/ingestors.py:41-73 (type parsing) and
  * :35-39 (key/ts discovery), but fails loudly instead of printing.
  */
final case class TableMeta(columns: Seq[ColumnMeta]) {

  /** Spark schema with the declared nullability. */
  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable)))

  def keyColumns: Seq[String] = columns.filter(_.key).map(_.name)

  /** The CDC id field — the reference takes the FIRST key column
    * (lib/ingestors.py:37).
    */
  def idField: String = keyColumns.headOption.getOrElse(
    throw new IllegalArgumentException("no key column declared in schema"))

  /** The CDC ordering field (first date_predicate, lib/ingestors.py:38). */
  def tsField: String = columns.find(_.datePredicate).map(_.name).getOrElse(
    throw new IllegalArgumentException("no date_predicate column declared in schema"))

  def tsFieldOption: Option[String] = columns.find(_.datePredicate).map(_.name)

  /** Flattened (column, test) pairs in declaration order — the shape
    * the quality engine dispatches on (lib/checker.py:68-88).
    */
  def columnTests: Seq[(ColumnMeta, TestSpec)] =
    for (c <- columns; t <- c.tests) yield (c, t)
}

object TableMeta {

  def fromYamlFile(path: String): TableMeta = fromYaml(Yaml.parseFile(path))

  def fromYamlString(text: String): TableMeta = fromYaml(Yaml.parse(text))

  def fromYaml(root: Yaml.Value): TableMeta = {
    val schemaList = root.get("schema") match {
      case Some(l: Yaml.YList) => l.items
      case other => throw new IllegalArgumentException(
        s"metadata must contain a 'schema' list, got $other")
    }
    TableMeta(schemaList.map(parseColumn))
  }

  private def parseColumn(v: Yaml.Value): ColumnMeta = {
    val name = v.str("name").getOrElse(
      throw new IllegalArgumentException(s"schema entry without a name: $v"))
    ColumnMeta(
      name = name,
      dataType = parseType(v),
      nullable = v.str("nullable").forall(_.equalsIgnoreCase("true")),
      key = v.bool("key"),
      datePredicate = v.bool("date_predicate"),
      mandate = v.str("mandate"),
      tests = v.list("tests").map(parseTest))
  }

  private def parseTest(v: Yaml.Value): TestSpec = {
    // scalar kwargs (threshold, expression, pattern) and list kwargs
    // (expected_values) split into two maps — Spark-side consumers want
    // typed access to each
    val (scalars, lists) = v.get("kwargs") match {
      case Some(m: Yaml.YMap) =>
        val s = m.entries.collect { case (k, vv: Yaml.YStr) => k -> vv.value }
        val l = m.entries.collect { case (k, vv: Yaml.YList) => k -> vv.items.map(_.asString) }
        (s.toMap, l.toMap)
      case _ => (Map.empty[String, String], Map.empty[String, Seq[String]])
    }
    TestSpec(
      testType = v.str("test_type").getOrElse(""),
      testName = v.str("test_name").getOrElse(""),
      kwargs = scalars,
      listKwargs = lists)
  }

  /** Recursive YAML-type → Spark-type parser; same surface as
    * lib/ingestors.py:41-73 (string/double/long/integer/timestamp,
    * nested struct via `fields`, array via `element_type` defaulting
    * to string).
    */
  private[meta] def parseType(v: Yaml.Value): DataType =
    v.str("type").map(_.toLowerCase) match {
      case Some("struct") =>
        val fields = v.list("fields").map { f =>
          StructField(
            f.str("name").getOrElse(""),
            parseType(f),
            f.str("nullable").forall(_.equalsIgnoreCase("true")))
        }
        StructType(fields)
      case Some("array") =>
        val elem = v.get("element_type").map(parseType).getOrElse(StringType)
        ArrayType(elem)
      case Some(scalar) => scalarType(scalar)
      case None => StringType
    }

  private def scalarType(name: String): DataType = name match {
    case "string" => StringType
    case "double" => DoubleType
    case "long" => LongType
    case "integer" => IntegerType
    case "timestamp" => TimestampType
    // Types the reference reaches only through SQL CAST (SURVEY §1.2);
    // accepting them in metadata generalizes the surface.
    case "float" => FloatType
    case "date" => DateType
    case "boolean" => BooleanType
    case "binary" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported type '$other'")
  }
}
