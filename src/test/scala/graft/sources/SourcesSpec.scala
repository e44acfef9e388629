package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv ingest with header + schema (GUI upload path)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "data.csv")
    val w = new java.io.PrintWriter(f)
    w.println("city,temp"); w.println("berlin,21.5"); w.println("oslo,3.0"); w.close()
    val schema = StructType(Seq(StructField("city", StringType), StructField("temp", DoubleType)))
    val df = FileSources.csv(spark, f.getAbsolutePath, Some(schema))
    assert(df.as[(String, Double)].collect().toSet == Set(("berlin", 21.5), ("oslo", 3.0)))
    // inference path too
    val inferred = FileSources.csv(spark, f.getAbsolutePath)
    assert(inferred.schema("temp").dataType == DoubleType)
  }

  test("json ingest (GUI upload path)") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "data.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"city":"berlin","temp":21.5}"""); w.close()
    val df = FileSources.json(spark, f.getAbsolutePath)
    assert(df.select("city", "temp").as[(String, Double)].collect().toSeq == Seq(("berlin", 21.5)))
  }

  test("orc round-trip with pushdown-capable scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val src = Tables(spark, "/root/testdata/sf0.001").customer
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    src.write.mode("overwrite").orc(dir)
    val back = FileSources.orc(spark, dir)
    assert(back.count() == src.count())
    val filtered = back.where(col("c_acctbal") > 0)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"),
      s"orc scan did not push the filter:\n$p")
  }

  test("SQL surface: registered views + kernel functions from spark.sql") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.registerAll()
    val viaSql = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_quantity > 30").as[Long].head()
    val viaDf = t.lineitem.where(col("l_quantity") > 30).count()
    assert(viaSql == viaDf && viaSql > 0)
    // custom kernels are SQL-registered via GraftExtensions
    val fp = spark.sql(
      "SELECT simhash64(graft_tokens(text)) FROM documents WHERE doc_id = 0").as[Long].head()
    val fpDf = t.documents.where(col("doc_id") === 0)
      .select(graft.ops.Dedup.simhash(col("text"))).as[Long].head()
    assert(fp == fpDf)
  }

  test("kafka wire-record decode: value json, key, headers, timestamp") {
    // simulate the Kafka source schema without a broker
    val wire = Seq(
      ("k1".getBytes, """{"sensor":"s1","temp":20.5}""".getBytes,
        new java.sql.Timestamp(1000),
        Seq(("trace", "abc".getBytes))),
      ("k2".getBytes, """{"sensor":"s2","temp":-1.0}""".getBytes,
        new java.sql.Timestamp(2000),
        Seq(("trace", "def".getBytes))))
      .toDF("key", "value", "timestamp", "headers")
      // kafka source headers are array<struct<key,value>>, not tuples
      .withColumn("headers", expr("transform(headers, h -> struct(h._1 AS key, h._2 AS value))"))
    val schema = StructType(Seq(StructField("sensor", StringType), StructField("temp", DoubleType)))
    val parsed = KafkaRecords.parseJson(wire, schema)
      .select(KafkaRecords.keyString.as("k"), col("record.sensor"), col("record.temp"),
        unix_millis(KafkaRecords.eventTime).as("ms"), KafkaRecords.header("trace").as("tr"))
    val rows = parsed.as[(String, String, Double, Long, String)].collect().toSet
    assert(rows == Set(("k1", "s1", 20.5, 1000L, "abc"), ("k2", "s2", -1.0, 2000L, "def")))
  }

  test("kafka wire-record encode -> decode round-trips without a broker") {
    val typed = Seq((7L, "s9", 42.25, "t-1"), (8L, "s10", -3.5, "t-2"))
      .toDF("id", "sensor", "temp", "trace")
    // encode to the exact frame format("kafka") ships
    val wire = typed.select(
      KafkaRecords.toKeyBytes(col("id")).as("key"),
      KafkaRecords.toJsonValue(struct(col("sensor"), col("temp"))).as("value"),
      KafkaRecords.toHeaders("trace" -> col("trace")).as("headers"))
      .withColumn("timestamp", lit(new java.sql.Timestamp(5000)))
    assert(wire.schema("key").dataType.simpleString == "binary")
    assert(wire.schema("value").dataType.simpleString == "binary")
    assert(wire.schema("headers").dataType.simpleString ==
      "array<struct<key:string,value:binary>>")
    val schema = StructType(Seq(StructField("sensor", StringType), StructField("temp", DoubleType)))
    val back = KafkaRecords.parseJson(wire, schema)
      .select(KafkaRecords.keyString.cast("long").as("id"),
        col("record.sensor"), col("record.temp"),
        KafkaRecords.header("trace").as("trace"))
      .as[(Long, String, Double, String)].collect().toSet
    assert(back == Set((7L, "s9", 42.25, "t-1"), (8L, "s10", -3.5, "t-2")))
  }
}
