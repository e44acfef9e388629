package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** The reference's record model on the Kafka wire format (SURVEY §1.5).
  *
  * StreamRecord(key, value, timestamp, headers)
  * (reference: common/serialization.py:131-151; wire form
  * common/protobuf/stream_processing.proto:7-12 — bytes key, bytes value,
  * int64 ms timestamp, string-map headers) maps 1:1 onto Spark's Kafka
  * source schema (key/value Binary, timestamp Timestamp, headers
  * Array<Struct<key,value>>). These helpers decode that envelope into
  * typed columns; they work on any DataFrame with the wire columns, so
  * they're testable without a broker.
  */
object KafkaRecords {

  /** JSONSerializer equivalent (reference: serialization.py:44-56):
    * value bytes → parsed struct columns. `schema` is the value type.
    */
  def parseJson(df: DataFrame, schema: DataType): DataFrame =
    df.withColumn("record",
        from_json(col("value").cast(StringType), schema.asInstanceOf[org.apache.spark.sql.types.StructType]))

  /** StringSerializer equivalent (serialization.py:59-67). */
  def parseString(df: DataFrame): DataFrame =
    df.withColumn("record", col("value").cast(StringType))

  /** Record key as string (keys are opaque bytes on the wire). */
  def keyString: Column = col("key").cast(StringType)

  /** Header lookup: first header value with the given key, as string
    * (headers: Array<Struct<key: String, value: Binary>>).
    */
  def header(name: String): Column =
    element_at(filter(col("headers"), h => h.getField("key") === name), 1)
      .getField("value").cast(StringType)

  /** Event-time from the Kafka record timestamp (epoch-ms in the
    * reference, TimestampType here).
    */
  def eventTime: Column = col("timestamp")

  // ---- encode (the write-side twin; serialization.py:44-56's dumps) ----
  // Kafka's sink contract is just (key Binary, value Binary, headers
  // Array<Struct<key,value>>) columns on the frame handed to
  // format("kafka") — these builders produce exactly that, so the full
  // encode→decode cycle round-trips in a spec without a broker.

  /** JSONSerializer encode: a struct column → value bytes. */
  def toJsonValue(record: Column): Column =
    to_json(record).cast("binary")

  /** StringSerializer encode. */
  def toStringValue(v: Column): Column = v.cast(StringType).cast("binary")

  /** Key bytes from any key column. */
  def toKeyBytes(key: Column): Column = key.cast(StringType).cast("binary")

  /** Wire headers from (name, value) pairs. */
  def toHeaders(pairs: (String, Column)*): Column =
    array(pairs.map { case (k, v) =>
      struct(lit(k).as("key"), v.cast(StringType).cast("binary").as("value"))
    }: _*)
}
