package graft.tools

import graft.core.GraftSession

/** Dev scratch main — SQL surface drive. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "scratch")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql(
      """SELECT source,
        |       count(DISTINCT rolling_fingerprint(split(lower(text), ' '), 5)) AS n_fp,
        |       count(DISTINCT simhash64(split(lower(text), ' '))) AS n_sh,
        |       count(*) AS n
        |FROM documents GROUP BY source ORDER BY source LIMIT 5""".stripMargin).show()
    spark.stop()
  }
}
