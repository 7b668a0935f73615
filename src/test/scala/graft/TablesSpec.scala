package graft

import java.nio.file.Files
import graft.sources.Tables

class TablesSpec extends SparkSpecBase {

  test("star tables load with expected keys") {
    Tables.starTables.foreach { t =>
      // events needs the typed loader (nanosecond-timestamp normalization)
      val df = if (t == "events") Tables.events(spark, Sf0001)
               else Tables.load(spark, Sf0001, t)
      assert(df.count() > 0, s"$t must be non-empty")
    }
  }

  test("events reader normalizes nanosecond timestamps") {
    val ev = Tables.events(spark, Sf0001)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    val y = ev.selectExpr("min(year(ts))").head().getInt(0)
    assert(y === 2024)
  }

  test("csv reader honors header + escape (reference ingest options)") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "co2.csv")
    val w = new java.io.PrintWriter(f)
    // reference dataset shape: country rows, year columns
    w.println("""Country Name,Country Code,2004,2014""")
    w.println(""""Germany, Fed.",DEU,10.5,8.9""")
    w.println("""France,FRA,6.1,5.0""")
    w.close()
    val df = Tables.csv(spark, f.getAbsolutePath, inferSchema = true)
    assert(df.columns.toSeq === Seq("Country Name", "Country Code", "2004", "2014"))
    assert(df.count() === 2)
    val de = df.filter(df("Country Code") === "DEU").head()
    assert(de.getString(0) === "Germany, Fed.")
    assert(de.getDouble(2) === 10.5)
  }

  test("csv malformed-row modes: PERMISSIVE nulls, DROPMALFORMED skips, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val f = Files.createTempFile("graft-bad", ".csv")
    Files.writeString(f, "id,v\n1,1.5\nnotanint,alsobad\n3,2.5\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType)))

    val permissive = Tables.csv(spark, f.toString, Some(schema)).collect()
    assert(permissive.length === 3)
    assert(permissive.count(r => r.isNullAt(0) && r.isNullAt(1)) === 1)

    val dropped = Tables.csv(spark, f.toString, Some(schema),
      mode = "DROPMALFORMED").collect()
    assert(dropped.length === 2)

    intercept[org.apache.spark.SparkException] {
      Tables.csv(spark, f.toString, Some(schema), mode = "FAILFAST").collect()
    }
  }

  test("json-lines reader honors an explicit schema (no inference pass)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val f = Files.createTempFile("graft-docs", ".jsonl")
    Files.writeString(f,
      """{"id":1,"name":"alpha"}
        |{"id":2,"name":"beta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Tables.jsonLines(spark, f.toString, Some(schema))
    assert(df.schema === schema)
    assert(df.as[(Long, String)].collect().toSet === Set((1L, "alpha"), (2L, "beta")))
  }

  test("jsonl malformed-line modes: PERMISSIVE quarantines the raw line, DROPMALFORMED skips, FAILFAST throws") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val f = Files.createTempFile("graft-docs-bad", ".jsonl")
    Files.writeString(f,
      """{"id":1,"name":"alpha"}
        |{"id":2,"name":"beta"
        |{"id":3,"name":"gamma"}
        |""".stripMargin) // line 2 is truncated mid-object
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    // Spark disallows corrupt-column-only projections straight off the
    // raw source (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the
    // parse once, then split good/bad
    val rows = Tables.jsonLinesRobust(spark, f.toString, schema).collect()
    val good = rows.filter(_.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "alpha"), (3L, "gamma")))
    // the bad line survives VERBATIM for quarantine — not silently dropped
    val bad = rows.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(bad.toSeq === Seq("{\"id\":2,\"name\":\"beta\""))

    val dropped = Tables.jsonLinesRobust(spark, f.toString, schema, mode = "DROPMALFORMED")
      .select("id").as[Long].collect().toSet
    assert(dropped === Set(1L, 3L))

    val e = intercept[org.apache.spark.SparkException] {
      Tables.jsonLinesRobust(spark, f.toString, schema, mode = "FAILFAST")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("typed Dataset loaders round-trip the same rows as the DataFrame path") {
    import spark.implicits._
    val typed = Tables.documentsTyped(spark, Sf0001)
    // typed transformations compile against the case class
    val longDocs = typed.filter(_.n_chars > 100).map(d => (d.doc_id, d.source))
    assert(longDocs.count() ===
      Tables.documents(spark, Sf0001).filter($"n_chars" > 100).count())
    val e = Tables.embeddingsTyped(spark, Sf0001).head()
    assert(e.embedding.length === 64)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
