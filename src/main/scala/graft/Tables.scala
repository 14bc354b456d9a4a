package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under the sf dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read nanos as raw Long (ns since epoch). Queries that need a
    // real timestamp derive it via timestamp_micros(ts div 1000).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Microsecond-precision timestamp from the raw nanosecond Long `ts`
    * column of `events` — matches DuckDB's µs TIMESTAMP exactly.
    * Integral division (`div`), not `/`: Spark `/` on longs is double
    * division and ns-epoch values exceed a double's 53-bit mantissa. */
  def eventTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(floor(c.cast("decimal(20,0)") / 1000).cast("long"))
  }
}
