package graft.tools

import org.apache.spark.sql.SparkSession

/** Within-one-JVM comparison of linkrank plan variants (VERDICT r3 #4:
  * the cross-run bench showed a 5.5 → 6.8 s move; run-to-run noise is
  * ±2-3 s, so only an in-JVM A/B separates signal from noise).
  *
  * Usage: runMain graft.tools.LinkrankBench [sfDir] [reps]
  */
object LinkrankBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: parquet footers + codegen
    graft.QueriesGraph.buildLinkrank(spark, sfDir,
      finalEager = false, cacheEdges = true).count()
    spark.catalog.clearCache()

    val variants = Seq(
      ("eager+cache (shipped r3)", true, true),
      ("lazy+cache", false, true),
      ("lazy+nocache", false, false),
      ("eager+nocache", true, false))
    for ((name, eager, cache) <- variants) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.QueriesGraph.buildLinkrank(spark, sfDir, eager, cache).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[linkrank-bench] $name%-26s ${times.map(t => f"$t%.2f").mkString(" ")} s  (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
