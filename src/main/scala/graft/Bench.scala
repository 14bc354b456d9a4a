package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the given SF,
  * prints one JSON line. Per-query failures are REPORTED (name → error in
  * an "errors" map, timing −1), never swallowed — a broken query must not
  * look fast. The block-manager cache is cleared between queries so
  * intra-query .cache() calls (minhash/simhash/ivf) can't leak memory
  * into later measurements. */
object Bench {
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not in
    // whichever query happens to run first
    try {
      Tables.names.foreach(t =>
        Tables(spark, sfDir, t).limit(1).count())
      spark.range(1000).selectExpr("md5(cast(id as string))").count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(160))
        }
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (err.isDefined) -1.0 else sec, err)
    }
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._3.isDefined)) {
      results.foreach { case (k, _, e) =>
        e.foreach(m => System.err.println(s"[bench] $k FAILED: $m"))
      }
      sys.exit(1)
    }
    spark.stop()
  }
}
