package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.sources.{FixtureSource, JdbcSource, TableSource}

/** Destination abstraction for [[graft.Migrator]]: where each table's
  * copy lands, plus how to read the destination back for `compareDb`
  * verification. Two implementations mirror the two source kinds —
  * [[ParquetDest]] (the fixture/test destination) and [[JdbcDest]]
  * (the production path: batched truncate+insert through
  * [[BatchWriter.writeJdbc]], exercised live against embedded Derby in
  * DerbyLiveJdbcSpec).
  */
trait TableDest {
  def write(df: DataFrame, name: String): Unit

  /** The destination as a readable [[TableSource]], for count/checksum
    * verification after the copy.
    */
  def asSource: TableSource
}

/** Parquet-directory destination: `<dir>/<name>.parquet` per table. */
final case class ParquetDest(dir: String) extends TableDest {
  def write(df: DataFrame, name: String): Unit =
    BatchWriter.writeParquet(df, dir, name)
  def asSource: TableSource = FixtureSource(dir)
}

/** JDBC destination: each table lands through the batched
  * truncate-before-load writer (the table is created by Spark's
  * dialect on first load when absent). `quoteIdent` defaults to ANSI
  * double quotes, preserving the source's lowercase table names
  * verbatim on case-folding engines.
  */
final case class JdbcDest(
    url: String,
    props: java.util.Properties,
    batchRowSize: Int = 1000,
    maxConnections: Int = 100,
    quoteIdent: String => String = n => "\"" + n + "\""
) extends TableDest {
  def write(df: DataFrame, name: String): Unit =
    BatchWriter.writeJdbc(df, url, quoteIdent(name), props,
      batchRowSize, maxConnections)
  def asSource: TableSource = JdbcSource(url, props)
}
