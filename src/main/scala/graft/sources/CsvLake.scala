package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5/S8 — the data-lake CSV surface of the reference
  * (README.md:359-406): master data lives as headered CSV files; the
  * warehouse registers them as external tables and queries re-cast
  * columns at read time.
  *
  *  - `registerExternalTable` mirrors OpenCSVSerde +
  *    `skip.header.line.count=1`: header consumed for names, EVERY
  *    column typed string, casts happen in the query (schema-on-read).
  *    A UTF-8 BOM on the first header cell — present in the
  *    reference's sensor_mapping.csv — is stripped from the column
  *    name (Spark's parser would otherwise keep it, silently breaking
  *    by-name references).
  *  - `registerInferred` mirrors the Glue-crawler path (S8): schema
  *    inference over the same files.
  *
  * Registration is `createOrReplaceTempView` — the J5 "persistent
  * enrichment view" then composes in plain SQL over these views.
  */
object CsvLake {

  private def stripBom(df: DataFrame): DataFrame = {
    val cols = df.columns.map(c => c.stripPrefix("﻿"))
    df.toDF(cols: _*)
  }

  /** Schema-on-read external table: header row, all columns string. */
  def registerExternalTable(spark: SparkSession, path: String, name: String): DataFrame = {
    val df = stripBom(spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path))
    df.createOrReplaceTempView(name)
    df
  }

  /** Crawler-style registration: same files, inferred types. */
  def registerInferred(spark: SparkSession, path: String, name: String): DataFrame = {
    val df = stripBom(spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path))
    df.createOrReplaceTempView(name)
    df
  }

  /** Headered CSV export under a prefix (the lake write side).
    * Timestamps are written with MICROsecond precision — Spark's CSV
    * default is millis, which silently truncates and breaks the typed
    * round-trip (CAST on read parses the 6-digit fraction fine). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  /** Positional crawler registration (README.md:407-424): the crawl of
    * an UN-NAMED CSV prefix — every column string, named col1..colN by
    * position. Consumers rebuild a typed relation with positional
    * renames + CASTs, and must carry the reference's garbage-row guard
    * (`substr(col2,1,1) = '2'`): the exported part files embed their
    * header line, which a positional crawl surfaces as a data row. */
  def registerPositional(spark: SparkSession, path: String, name: String): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("inferSchema", "false")
      .csv(path)
    val df = raw.toDF(raw.columns.indices.map(i => s"col${i + 1}"): _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** Full S8: crawler-style CATALOG registration — inferred schema
    * persisted as a metastore table (survives the session, visible to
    * any SQL client of the warehouse), not just a temp view.
    */
  def crawlIntoCatalog(spark: SparkSession, path: String, table: String): Unit =
    stripBom(spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path))
      .write.mode("overwrite").saveAsTable(table)

  /** S5/J5 persistent form: an EXTERNAL schema-on-read catalog TABLE —
    * same OpenCSVSerde semantics as [[registerExternalTable]] (header
    * consumed for names, every column string, casts in the query) but
    * registered in the session CATALOG, so any other session against
    * the same warehouse (`spark.newSession()`, a JDBC/Thrift client)
    * resolves it by name — the Athena external-table behavior, where
    * registration outlives the registering session. No data is copied:
    * the table is `USING csv` over the lake prefix, so the scan still
    * prunes/pushes like any file-source read. DROP + CREATE keeps the
    * call idempotent and re-points the table if the prefix moved.
    */
  def registerExternalCatalogTable(spark: SparkSession, path: String, name: String): Unit = {
    val header = stripBom(spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)).columns
    val ddlCols = header.map(c => s"`$c` STRING").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` ($ddlCols) USING csv " +
      s"OPTIONS (path '$path', header 'true')")
  }

  /** Catalog registration of a parquet prefix as an EXTERNAL table —
    * the fact-table counterpart of [[registerExternalCatalogTable]],
    * needed because a persistent view may only reference catalog
    * objects (a view over a temp view would be dropped with the
    * session that owns the temp view).
    */
  def registerParquetCatalogTable(spark: SparkSession, path: String, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING parquet OPTIONS (path '$path')")
  }
}
