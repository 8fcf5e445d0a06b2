package graft.meta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.QualifyRewrite

/** Parity evidence against the reference's OWN metadata and transform
  * files (read-only at /root/reference): the YAML parser must handle
  * every real schema file and the QUALIFY splitter every real
  * transform. Skipped gracefully when the reference tree is absent.
  */
class ReferenceMetaSpec extends AnyFunSuite {

  private val ref = "/root/reference"
  private def available = Files.isDirectory(Paths.get(ref))

  test("reference tickers.yml parses: nested array<struct> and struct types, key/ts discovery") {
    assume(available)
    val meta = TableMeta.fromYamlFile(s"$ref/bronze/tickers/tickers.yml")
    assert(meta.idField === "symbol")
    assert(meta.tsField === "regularMarketTime")
    val hist = meta.schema("historicalDataPrice").dataType
    hist match {
      case ArrayType(s: StructType, _) =>
        assert(s.fieldNames.toSeq === Seq("date", "open", "high", "low", "close", "volume", "adjustedClose"))
        assert(s.fields.forall(_.dataType === StringType))
      case other => fail(s"historicalDataPrice should be array<struct>, got $other")
    }
    meta.schema("summaryProfile").dataType match {
      case s: StructType =>
        assert(s.fieldNames.contains("longBusinessSummary"))
        assert(s("companyOfficers").dataType.isInstanceOf[ArrayType])
      case other => fail(s"summaryProfile should be struct, got $other")
    }
  }

  test("reference assets.yml and silver YAMLs parse with tests and mandates") {
    assume(available)
    val assets = TableMeta.fromYamlFile(s"$ref/bronze/assets/assets.yml")
    assert(assets.idField === "stocks")
    assert(assets.tsField === "loaded_at")
    assert(assets.columns.forall(_.dataType === StringType))

    val prices = TableMeta.fromYamlFile(s"$ref/silver/prices/prices.yml")
    assert(prices.keyColumns === Seq("symbol", "date"))
    val tests = prices.columnTests
    // outdated threshold kwarg survives parsing
    val outdated = tests.collectFirst { case (c, t) if t.testType == "outdated" => (c, t) }
    assert(outdated.exists { case (c, t) => c.name == "date" && t.kwargs("threshold") == "15" })
    // outside_of_rules expressions arrive as SQL strings
    val rules = tests.filter(_._2.testType == "outside_of_rules")
    assert(rules.map(_._2.kwargs("expression")).contains("high < low"))

    val profile = TableMeta.fromYamlFile(s"$ref/silver/summary_profile/summary_profile.yml")
    assert(profile.columns.flatMap(_.mandate).toSet ===
      Set("global_required", "local_required", "local_optional"))
    // 31 declared test instances across the two silver tables (19
    // prices + 12 summary_profile — SURVEY §5 originally undercounted)
    assert(tests.size === 19)
    assert(profile.columnTests.size === 12)
  }

  test("reference job_metadata.yml files parse and find declared jobs") {
    assume(available)
    val bronze = JobRegistry.fromYamlFile(s"$ref/bronze/job_metadata.yml")
    assert(bronze.find("full", "bronze_full").tables.map(_.tableName).toSet ===
      Set("assets", "tickers"))
    assert(bronze.find("cdc", "bronze_cdc").tables.forall(_.inputFormat == "json"))
    val silver = JobRegistry.fromYamlFile(s"$ref/silver/job_metadata.yml")
    assert(silver.find("full", "silver_full").tables.map(_.tableName).toSet ===
      Set("prices", "summary_profile"))
    assert(silver.jobs.flatMap(_.tables).forall(_.inputFormat == "delta"))
  }

  test("every reference transform's QUALIFY splits to a window predicate") {
    assume(available)
    val transforms = Seq(
      s"$ref/bronze/assets/assets.sql",
      s"$ref/bronze/tickers/tickers.sql",
      s"$ref/silver/prices/prices.sql",
      s"$ref/silver/summary_profile/summary_profile.sql")
    transforms.foreach { path =>
      val sql = Files.readString(Paths.get(path))
      val (inner, pred) = QualifyRewrite.split(sql)
      assert(pred.isDefined, path)
      assert(pred.get.toUpperCase.contains("ROW_NUMBER() OVER"), path)
      assert(!inner.toUpperCase.contains("QUALIFY"), path)
    }
    // the gold view has no QUALIFY and must pass through untouched
    val gold = Files.readString(Paths.get(s"$ref/Pipelines/Test/transformations/test.sql"))
    assert(QualifyRewrite.split(gold)._2.isEmpty)
  }
}
