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

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
