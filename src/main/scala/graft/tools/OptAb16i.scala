package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Similarity}

/** Wave-3 same-JVM interleaved A/B (r16): the ngram_jaccard verify
  * stage. Legacy arm = unsorted hbs + size(array_intersect) (the r15
  * shape, a per-pair hash-set build + materialized intersection
  * array); new arm = the SHIPPED query body (hbs sorted once per doc
  * at cache build + ProfileOps.interCountSorted allocation-free
  * merge). Arms differ only in the verify expression and the one-time
  * per-doc sort; referee compares final sorted rows.
  *
  * Usage: runMain graft.tools.OptAb16i <sfDir> [reps]
  */
object OptAb16i {
  private val H = 12
  private val BAND = 3
  private val CAP = 65536

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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

    /** The r15 query body, byte-equal to the shipped one except hbs
      * stays unsorted and the verify is size(array_intersect). */
    def legacy(): DataFrame = {
      val d0 = graft.Queries.spread(
        graft.Tables(spark, sfDir, "documents"), col("doc_id"))
      val d = d0.select(col("doc_id"),
        substring(col("text"), 1, CAP).as("text"))
      val per = d.where(col("text").isNotNull)
        .select(col("doc_id"),
          Similarity.minhashProfile(
            Similarity.charShingles(col("text"), 5), H).as("p"))
        .select(Seq(col("doc_id"), col("p.hbs").as("hbs"),
          col("p.n").as("n")) ++
          (0 until H).map(i => col("p.ms").getItem(i).as(s"m$i")): _*)
        .cache()
      val nBands = H / BAND
      val bandCols = (0 until nBands).map { b =>
        val ms = (b * BAND until (b + 1) * BAND).map(i => col(s"m$i"))
        struct(lit(b).as("band"),
          Hashing.md5Long(concat_ws(",", ms: _*)).as("h"))
      }
      val bands = per.select(col("doc_id"),
          explode(array(bandCols: _*)).as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"),
          col("bh.h").as("h"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val sz = per.select(col("doc_id"), col("n"))
      val candSized = cand
        .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
        .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
        .filter(least(col("na"), col("nb")) * 2 >=
          greatest(col("na"), col("nb")))
      val sa = per.select(col("doc_id").as("a_id"), col("hbs").as("a_hbs"))
      val sb = per.select(col("doc_id").as("b_id"), col("hbs").as("b_hbs"))
      candSized.repartition(spark.sparkContext.defaultParallelism)
        .join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter",
          size(array_intersect(col("a_hbs"), col("b_hbs"))).cast("long"))
        .withColumn("jaccard",
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
    }

    def shipped(): DataFrame =
      graft.SparkEntry.queries("ngram_jaccard")(spark, sfDir)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "verify_legacy" -> (() => legacy()),
      "verify_merge" -> (() => shipped()))

    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    require(sortedRows(arms(0)._2()) == sortedRows(arms(1)._2()),
      s"${arms(0)._1} vs ${arms(1)._1}: arms disagree")
    println(s"[referee] ${arms(0)._1} == ${arms(1)._1}")

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
    println(s"""{"metric":"opt_ab16i","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
