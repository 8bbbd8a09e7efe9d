package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.validate.Validators

/** V2–V5 goldens — reference src/ETL/TestCommonFunctions.py:65-302. */
class ValidatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- validate_column fixtures (TestCommonFunctions.py:67-113) ----

  private val vcSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("correct_name", StringType),
    StructField("age", IntegerType),
    StructField("date", StringType),
    StructField("validation_status", StringType),
    StructField("invalid_columns", ArrayType(StringType))))

  private def vcFixture = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("1", "Alice", "Alice", 25, "5", "", Seq.empty[String]),
      Row("2", "Bob", "Bob", 30, "test", "", Seq.empty[String]),
      Row("a", "Chartie", "Charlie", 35, "2013-06-15T18:14:57.000+0000", "",
        Seq.empty[String])),
    vcSchema)

  test("validate_column numeric flags uncastable ids") {
    val got = Validators.validateColumn(vcFixture, "id", "numeric")
    TestSpark.assertSameRows(got.select("id", "validation_status", "invalid_columns"), Seq(
      Seq("1", "", Nil),
      Seq("2", "", Nil),
      Seq("a", "invalid", List("id"))))
  }

  test("validate_column string comparison wraps prior diagnostics (quirk)") {
    val numeric = Validators.validateColumn(vcFixture, "id", "numeric")
    val got = Validators.validateColumn(numeric, "name", "string",
      comparisonColumn = Some("correct_name"))
    TestSpark.assertSameRows(got.select("id", "validation_status", "invalid_columns"), Seq(
      Seq("1", "", Nil),
      Seq("2", "", Nil),
      Seq("a", "invalid", List("name, id"))))
  }

  test("validate_column string accepted-values matches comparison variant") {
    val numeric = Validators.validateColumn(vcFixture, "id", "numeric")
    val got = Validators.validateColumn(numeric, "name", "string",
      acceptedValues = Seq("Alice", "Bob", "Charlie"))
    TestSpark.assertSameRows(got.select("id", "validation_status", "invalid_columns"), Seq(
      Seq("1", "", Nil),
      Seq("2", "", Nil),
      Seq("a", "invalid", List("name, id"))))
  }

  test("validate_column timestamp flags unparsable dates") {
    val got = Validators.validateColumn(vcFixture, "date", "timestamp")
    TestSpark.assertSameRows(got.select("id", "validation_status", "invalid_columns"), Seq(
      Seq("1", "invalid", List("date")),
      Seq("2", "invalid", List("date")),
      Seq("a", "", Nil)))
  }

  test("validate_column rejects unknown datatype and bad string args") {
    intercept[IllegalArgumentException] {
      Validators.validateColumn(vcFixture, "id", "float")
    }
    intercept[IllegalArgumentException] {
      Validators.validateColumn(vcFixture, "name", "string")
    }
  }

  // ---- validate_relationship (TestCommonFunctions.py:119-153) ----

  test("validate_relationship flags dangling FKs via anti-join semantics") {
    val relSchema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("value", StringType),
      StructField("validation_status", StringType),
      StructField("invalid_relationship", ArrayType(StringType))))
    val child = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "A", "", Seq.empty[String]), Row(2, "B", "", Seq.empty[String]),
      Row(3, "C", "", Seq.empty[String]), Row(4, "D", "", Seq.empty[String])),
      relSchema)
    val parent = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "X", "", Seq.empty[String]), Row(2, "Y", "", Seq.empty[String]),
      Row(3, "Z", "", Seq.empty[String])), relSchema)
    val got = Validators.validateRelationship(child, "id", parent, "id")
    TestSpark.assertSameRows(got, Seq(
      Seq(1, "A", "", Nil),
      Seq(2, "B", "", Nil),
      Seq(3, "C", "", Nil),
      Seq(4, "D", "invalid", List("id"))))
  }

  test("validate_relationship keeps NULL FKs valid (reference isin-null semantics)") {
    val relSchema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("validation_status", StringType),
      StructField("invalid_relationship", ArrayType(StringType))))
    val child = spark.createDataFrame(java.util.Arrays.asList(
      Row(null, "", Seq.empty[String]), Row(9, "", Seq.empty[String])), relSchema)
    val parent = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "", Seq.empty[String])), relSchema)
    val got = Validators.validateRelationship(child, "id", parent, "id")
    TestSpark.assertSameRows(got, Seq(
      Seq(null, "", Nil),
      Seq(9, "invalid", List("id"))))
  }

  // ---- check_ingestion_status (TestCommonFunctions.py:157-219) ----

  private val ciSchema = StructType(Seq(
    StructField("id1", IntegerType),
    StructField("id2", IntegerType),
    StructField("name", StringType),
    StructField("age", IntegerType),
    StructField("city", StringType),
    StructField("ingestion_timestamp", StringType),
    StructField("validation_status", StringType),
    StructField("invalid_columns", ArrayType(StringType)),
    StructField("silver_ingestion_status", StringType)))

  private def ciRow(id1: Int, id2: Int, name: String, age: Int, city: String,
      ts: String, st: String, ic: Seq[String], sis: String) =
    Row(id1, id2, name, age, city, ts, st, ic, sis)

  private def ciFixture = spark.createDataFrame(java.util.Arrays.asList(
    ciRow(1, 1, "John", 22, "New York", "2024-02-13 12:00:00", "", Nil, ""),
    ciRow(2, 1, "Doe", 28, "Seattle", "2024-02-14 12:01:00", "", Nil, ""),
    ciRow(3, 1, "Smith", 22, "San Francisco", "2024-02-14 12:02:00", "", Nil, ""),
    ciRow(1, 1, "John", 22, "New York", "2024-02-14 12:03:00", "", Nil, ""),
    ciRow(1, 2, "Tony", 22, "New York", "2024-02-14 12:00:00", "", Nil, ""),
    ciRow(4, 1, "John", 22, "New York", "2024-02-14 12:03:00", "invalid",
      Seq("id1"), "")), ciSchema)

  private def ciIngested = spark.createDataFrame(java.util.Arrays.asList(
    ciRow(1, 1, "John", 22, "New York", "2024-02-13 12:00:00", "", Nil, ""),
    ciRow(2, 1, "Doe", 28, "Seattle", "2024-02-14 12:01:00", "", Nil, "")),
    ciSchema)

  test("check_ingestion_status single key") {
    val got = Validators.checkIngestionStatus(ciFixture, ciIngested, Seq("id1"))
    TestSpark.assertSameRows(
      got.select("id1", "id2", "name", "silver_ingestion_status"), Seq(
        Seq(1, 1, "John", "ingested"),
        Seq(2, 1, "Doe", "ingested"),
        Seq(3, 1, "Smith", "not_ingested"),
        Seq(1, 1, "John", "ingested"),
        Seq(1, 2, "Tony", "ingested"),
        Seq(4, 1, "John", "not_ingested")))
  }

  test("check_ingestion_status composite key") {
    val got = Validators.checkIngestionStatus(ciFixture, ciIngested, Seq("id1", "id2"))
    TestSpark.assertSameRows(
      got.select("id1", "id2", "name", "silver_ingestion_status"), Seq(
        Seq(1, 1, "John", "ingested"),
        Seq(2, 1, "Doe", "ingested"),
        Seq(3, 1, "Smith", "not_ingested"),
        Seq(1, 1, "John", "ingested"),
        Seq(1, 2, "Tony", "not_ingested"),
        Seq(4, 1, "John", "not_ingested")))
  }

  // ---- identify_duplicates (TestCommonFunctions.py:225-302) ----

  private val idSchema = StructType(Seq(
    StructField("id1", IntegerType),
    StructField("id2", IntegerType),
    StructField("ingestion_timestamp", StringType),
    StructField("validation_status", StringType),
    StructField("invalid_columns", ArrayType(StringType)),
    StructField("silver_ingestion_status", StringType)))

  private def idFixture(firstTs: String) = spark.createDataFrame(java.util.Arrays.asList(
    Row(1, 1, firstTs, "", Seq.empty[String], "ingested"),
    Row(2, 1, "2024-02-14 12:01:00", "", Seq.empty[String], "not_ingested"),
    Row(3, 1, "2024-02-14 12:02:00", "", Seq.empty[String], "not_ingested"),
    Row(1, 1, "2024-02-14 12:03:00", "", Seq.empty[String], "ingested"),
    Row(1, 2, "2024-02-14 12:00:00", "", Seq.empty[String], "ingested"),
    Row(4, 1, "2024-02-14 12:03:00", "invalid", Seq("name"), "not_ingested"),
    Row(2, 1, "2024-02-14 12:01:00", "", Seq.empty[String], "not_ingested")),
    idSchema)

  test("identify_duplicates single key") {
    val got = Validators.identifyDuplicates(
      idFixture("2024-01-13 12:00:00"), Seq("id1"), "ingestion_timestamp")
    TestSpark.assertSameRows(
      got.select("id1", "id2", "ingestion_timestamp", "validation_status",
        "invalid_columns", "is_duplicate"), Seq(
        Seq(1, 1, "2024-01-13 12:00:00", "", Nil, false),
        Seq(2, 1, "2024-02-14 12:01:00", "invalid", List("id1"), true),
        Seq(3, 1, "2024-02-14 12:02:00", "", Nil, false),
        Seq(1, 1, "2024-02-14 12:03:00", "invalid", List("id1"), true),
        Seq(1, 2, "2024-02-14 12:00:00", "invalid", List("id1"), true),
        Seq(4, 1, "2024-02-14 12:03:00", "invalid", List("name"), false),
        Seq(2, 1, "2024-02-14 12:01:00", "invalid", List("id1"), true)))
  }

  test("identify_duplicates composite key") {
    val got = Validators.identifyDuplicates(
      idFixture("2024-02-13 12:00:00"), Seq("id1", "id2"), "ingestion_timestamp")
    TestSpark.assertSameRows(
      got.select("id1", "id2", "ingestion_timestamp", "validation_status",
        "invalid_columns", "is_duplicate"), Seq(
        Seq(1, 1, "2024-02-13 12:00:00", "", Nil, false),
        Seq(2, 1, "2024-02-14 12:01:00", "invalid", List("id1, id2"), true),
        Seq(3, 1, "2024-02-14 12:02:00", "", Nil, false),
        Seq(1, 1, "2024-02-14 12:03:00", "invalid", List("id1, id2"), true),
        Seq(1, 2, "2024-02-14 12:00:00", "", Nil, false),
        Seq(4, 1, "2024-02-14 12:03:00", "invalid", List("name"), false),
        Seq(2, 1, "2024-02-14 12:01:00", "invalid", List("id1, id2"), true)))
  }

  test("check_ingestion_status survives dirty string keys vs typed silver keys") {
    // raw bronze: string ids including an uncastable one; silver: bigint ids.
    // A typed comparison would make ANSI insert a crashing cast on "abc".
    val bronze = spark.createDataFrame(java.util.Arrays.asList(
      Row("1"), Row("abc"), Row("7")),
      StructType(Seq(StructField("id", StringType))))
    val silver = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L), Row(2L)),
      StructType(Seq(StructField("id", LongType))))
    val got = Validators.checkIngestionStatus(bronze, silver, Seq("id"))
    TestSpark.assertSameRows(got, Seq(
      Seq("1", "ingested"), Seq("abc", "not_ingested"), Seq("7", "not_ingested")))
  }

  test("identify_duplicates tie-breaker makes the survivor deterministic") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, 2, "2024-01-01 00:00:00", "", Seq.empty[String], "ingested"),
      Row(1, 1, "2024-01-01 00:00:00", "", Seq.empty[String], "ingested")),
      idSchema)
    val got = Validators.identifyDuplicates(df, Seq("id1"),
      "ingestion_timestamp", tieBreakers = Seq("id2"))
    // id2=1 sorts first → survives; id2=2 is the duplicate
    TestSpark.assertSameRows(got.select("id2", "validation_status"), Seq(
      Seq(1, ""), Seq(2, "invalid")))
  }

  test("finalizeValid labels untouched rows") {
    val seeded = Validators.initDiagnostics(ciFixture.select("id1"))
    val got = Validators.finalizeValid(seeded)
    assert(TestSpark.rows(got.select("validation_status")).forall(_ == Seq("valid")))
  }
}
