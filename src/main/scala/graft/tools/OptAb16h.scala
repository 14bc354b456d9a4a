package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PrefixSum parts sweep on REAL query bodies (asof_join is the
  * heaviest PrefixSum user: its two range-scan stages carry 8.1+3.1
  * executor-CPU-s at parts=32/local[32] but 0.94+0.20 at
  * parts=8/local[8] — the spread()-style concurrency-contention
  * pathology, StageProbe). Same-JVM interleaved via the
  * `graft.prefixsum.parts` sys-prop; referee row-identity per query
  * across parts (the scan's result is parts-invariant by design).
  *
  * Usage: runMain graft.tools.OptAb16h <sfDir> [reps] [queries] [parts]
  */
object OptAb16h {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val qs = (if (args.length > 2) args(2)
      else "asof_join,curriculum_order,pack_chunks").split(",").toSeq
    val parts = (if (args.length > 3) args(3) else "32,16,8,4")
      .split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new graft.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val board = graft.SparkEntry.queries

    def at[A](p: Int)(f: => A): A = {
      sys.props("graft.prefixsum.parts") = p.toString
      try f finally sys.props.remove("graft.prefixsum.parts")
    }
    def run(q: String, p: Int): DataFrame = at(p)(board(q)(spark, sfDir))
    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    for (q <- qs) {
      val ref = sortedRows(run(q, parts.head))
      for (p <- parts.tail)
        require(sortedRows(run(q, p)) == ref, s"$q: parts=$p disagrees")
    }
    println(s"[referee] all queries row-identical across parts $parts")

    val arms: Seq[(String, () => DataFrame)] = qs.flatMap(q =>
      parts.map(p => s"${q}_p$p" -> (() => run(q, p))))
    val wall = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val cpu = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      meter.reset()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      wall(name) = wall(name) :+ dt
      cpu(name) = cpu(name) :+ meter.cpuSec
      spark.catalog.clearCache()
    }
    def j(m: collection.Map[String, Vector[Double]]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s""""$k":${math.round(v.min * 1000) / 1000.0}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"opt_ab16h","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
