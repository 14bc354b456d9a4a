package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r15 #7 probe: does shrinking the explicit spread() width
  * below core count help KB-scale inputs at local[32]? spread()
  * repartitions a single-row-group scan to `defaultParallelism` so
  * CPU-dense map work engages every core; the r15 verdict asked
  * whether input-size-derived (smaller) widths cut the 32-task
  * stage-scheduling overhead that dominates sub-second queries.
  *
  * Two representative shapes over the SAME spread target (documents on
  * doc_id — every spread call site in the repo wraps exactly this):
  *   dense — winnow_fingerprint's body (md5 per 5-gram: heavy CPU/byte)
  *   cheap — per-doc token count + global agg (near scan-cost map)
  * at widths {32, 16, 8, 4}, same-JVM interleaved, min-of-reps.
  *
  * Usage: runMain graft.tools.OptAb16f <sfDir> [reps]
  */
object OptAb16f {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
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

    def docs(width: Int): DataFrame = graft.Tables(spark, sfDir, "documents")
      .repartition(width, col("doc_id"))

    def dense(width: Int): DataFrame = docs(width)
      .select(col("doc_id"),
        explode(graft.functions.Similarity.winnowMins(col("text"), 5, 4))
          .as("mh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(col("mh") % 1000000000L).as("fp_digest"))

    def cheap(width: Int): DataFrame = docs(width)
      .select(col("doc_id"),
        graft.functions.Similarity.nonEmptyTokens(col("text")).as("nt"))
      .groupBy(col("doc_id") % 7)
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))

    val widths = Seq(32, 16, 8, 4)
    val arms: Seq[(String, () => DataFrame)] =
      widths.flatMap(w => Seq(
        s"dense_w$w" -> (() => dense(w)),
        s"cheap_w$w" -> (() => cheap(w))))

    def sortedRows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val denseRef = sortedRows(dense(widths.head))
    val cheapRef = sortedRows(cheap(widths.head))
    for (w <- widths.tail) {
      require(sortedRows(dense(w)) == denseRef, s"dense_w$w disagrees")
      require(sortedRows(cheap(w)) == cheapRef, s"cheap_w$w disagrees")
    }
    println("[referee] all widths row-identical per shape")

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
    println(s"""{"metric":"opt_ab16f","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
