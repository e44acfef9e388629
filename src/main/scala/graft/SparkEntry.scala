package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` for the
  * correctness gate.
  *
  * Determinism conventions (so Spark and DuckDB hash-match bit-for-bit):
  *  - double aggregation runs in DECIMAL(18,2) (order-independent), cast to
  *    DOUBLE on output; avg/ratios are scalar double ops on exact inputs.
  *  - all event-time values are compared as epoch milliseconds
  *    (`unix_millis` / `epoch_ms`) — no timestamp-precision ambiguity
  *    between Spark (µs) and DuckDB (ns).
  *  - every ordering has a unique tiebreaker column.
  */
object SparkEntry {

  /** Flagship: the reference's word count (examples/word_count.py:40-51) on
    * sf0.001 documents. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator (SURVEY §2 + the LLM-pipeline
    * families) — declaration order preserved across the four chunk
    * files; the driver sees one flat map, exactly as before the split.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueriesA.queries ++ EntryQueriesB.queries ++ EntryQueriesC.queries ++ EntryQueriesD.queries

  /** DuckDB-equivalent SQL for every `queries` key (the driver's
    * correctness gate): the batch bodies plus the streaming aliases.
    */
  def oracleSql: Map[String, String] =
    EntryOraclesBase.base ++ EntryOraclesExt.sql
}
