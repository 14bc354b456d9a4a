package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r15 #7 probe, part 2: the REAL query bodies at spread
  * widths {cores, 10} — same-JVM interleaved via the
  * `graft.spread.width` system property that spread() reads per call.
  * Part 1 (OptAb16f) showed synthetic dense/cheap shapes both prefer
  * w8–16 over w32 at sf0.1's 584 KB documents table; this checks the
  * heavy-CPU spread users (bpe_encode ~6 CPU-s, kn_bigram_ppl ~9,
  * bm25_search, ngram_jaccard ~27) where fewer tasks serialize real
  * map work, plus two cheap representatives.
  *
  * Usage: runMain graft.tools.OptAb16g <sfDir> [reps] [w2] [queries] [widths]
  * With [widths] (comma-separated) given, sweeps each query over all
  * widths instead of the {cores, w2} pair.
  */
object OptAb16g {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val w2 = if (args.length > 2) args(2).toInt else 10
    val qsOverride = if (args.length > 3) Some(args(3).split(",").toSeq) else None
    val widthsOverride =
      if (args.length > 4) Some(args(4).split(",").map(_.toInt).toSeq) else None
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

    val qs = qsOverride.getOrElse(Seq("bpe_encode", "kn_bigram_ppl",
      "bm25_search", "winnow_fingerprint", "quality_gopher", "span_dedup"))
    val board = graft.SparkEntry.queries

    def at[A](w: Int)(f: => A): A = {
      sys.props("graft.spread.width") = w.toString
      try f finally sys.props.remove("graft.spread.width")
    }
    def run(q: String, w: Int): DataFrame = at(w)(board(q)(spark, sfDir))

    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    val widths = widthsOverride.getOrElse(Seq(cpus.toInt, w2))
    for (q <- qs) {
      val ref = sortedRows(run(q, widths.head))
      for (w <- widths.tail)
        require(sortedRows(run(q, w)) == ref, s"$q: width $w disagrees")
    }
    println(s"[referee] all queries row-identical across widths $widths")

    val arms: Seq[(String, () => DataFrame)] = qs.flatMap(q =>
      widths.map(w => s"${q}_w$w" -> (() => run(q, w))))
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
    println(s"""{"metric":"opt_ab16g","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
