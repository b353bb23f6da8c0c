package graft

import graft.sources.CsvLake

import java.nio.file.{Files, Path}

/** Schema-on-read CSV wrinkles the reference's data actually has:
  * UTF-8 BOM before the first header cell (sensor_mapping.csv),
  * quoted values containing commas (customer_data.csv), all-string
  * typing with casts at query time, and crawler-style inference.
  */
class CsvLakeSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("UTF-8 BOM on the header is stripped from the first column name") {
    val dir = tmp("bom_csv")
    val content = "﻿sensor_id,customer_id\nsensor-00,1\nsensor-01,2\n"
    Files.write(dir.resolve("mapping.csv"), content.getBytes("UTF-8"))
    val df = CsvLake.registerExternalTable(spark, dir.toString, "bom_mapping")
    assert(df.columns.toSeq == Seq("sensor_id", "customer_id"))
    assert(df.count() == 2)
    assert(spark.sql("SELECT sensor_id FROM bom_mapping ORDER BY sensor_id")
      .collect().map(_.getString(0)).toSeq == Seq("sensor-00", "sensor-01"))
  }

  test("external table types every column string; casts happen in the query") {
    val dir = tmp("str_csv")
    Files.write(dir.resolve("d.csv"), "id,price,ts\n1,10.5,2024-01-01 00:00:00\n".getBytes("UTF-8"))
    val df = CsvLake.registerExternalTable(spark, dir.toString, "strings_t")
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val row = spark.sql(
      "SELECT CAST(id AS BIGINT) AS id, CAST(price AS DOUBLE) AS price, CAST(ts AS TIMESTAMP) AS ts FROM strings_t")
      .collect().head
    assert(row.getLong(0) == 1L && row.getDouble(1) == 10.5)
    assert(row.getTimestamp(2).toString.startsWith("2024-01-01"))
  }

  test("quoted values containing commas survive the round trip") {
    val dir = tmp("quote_csv")
    val content = "customer_id,company_name,contact_person\n1,\"Acme, Inc.\",\"Doe, Jane\"\n"
    Files.write(dir.resolve("c.csv"), content.getBytes("UTF-8"))
    val df = CsvLake.registerExternalTable(spark, dir.toString, "quoted_t")
    val row = df.collect().head
    assert(row.getString(1) == "Acme, Inc." && row.getString(2) == "Doe, Jane")
  }

  test("crawler-style inference types numeric columns (S8)") {
    val dir = tmp("infer_csv")
    Files.write(dir.resolve("d.csv"), "id,price\n1,10.5\n2,11.0\n".getBytes("UTF-8"))
    val df = CsvLake.registerInferred(spark, dir.toString, "inferred_t")
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.schema("price").dataType.typeName == "double")
  }

  test("crawlIntoCatalog persists an inferred-schema metastore table (S8)") {
    val dir = tmp("crawl_csv")
    Files.write(dir.resolve("d.csv"), "id,price\n1,10.5\n2,11.0\n".getBytes("UTF-8"))
    CsvLake.crawlIntoCatalog(spark, dir.toString, "crawled_t")
    assert(spark.catalog.tableExists("crawled_t"))
    val t = spark.table("crawled_t")
    assert(t.schema("price").dataType.typeName == "double")
    assert(t.count() == 2)
    spark.sql("DROP TABLE crawled_t")
  }

  test("positional crawl: col1..colN all-string, header line surfaces as a guarded data row") {
    val dir = tmp("positional_csv")
    Files.write(dir.resolve("d.csv"), "id,price\n1,10.5\n2,11.0\n".getBytes("UTF-8"))
    val df = CsvLake.registerPositional(spark, dir.toString, "positional_t")
    assert(df.columns.toSeq == Seq("col1", "col2"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    // the header line is a data row in a positional crawl — 3 rows total
    assert(df.count() == 3)
    // the reference's guard drops it; typed view parses what remains
    val typed = spark.sql(
      """SELECT CAST(col1 AS BIGINT) AS id, CAST(col2 AS DOUBLE) AS price
        |FROM positional_t WHERE substr(col1, 1, 1) <> 'i' ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(typed.toSeq == Seq((1L, 10.5), (2L, 11.0)))
  }

  test("csv-sourced enrichment equals the parquet-native join") {
    val dir = tmp("lake_csv")
    CsvLake.exportCsv(Tables.nation(spark, sf("sf0.001")), s"$dir/nation_csv")
    CsvLake.registerExternalTable(spark, s"$dir/nation_csv", "nation_rt")
    val viaCsv = spark.sql(
      "SELECT CAST(n_nationkey AS BIGINT) AS k, n_name FROM nation_rt ORDER BY k")
      .collect().map(_.toSeq)
    val direct = Tables.nation(spark, sf("sf0.001"))
      .selectExpr("n_nationkey AS k", "n_name").orderBy("k")
      .collect().map(_.toSeq)
    assert(viaCsv.toSeq == direct.toSeq)
  }
}
