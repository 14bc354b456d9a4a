package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Similarity}

/** Same-JVM A/B isolating the r15 ngram_jaccard change: the old
  * explode + 14-aggregate signature pass vs the minhashProfile scalar,
  * both as (a) the signature frame alone and (b) the full query
  * downstream. Usage: runMain graft.tools.NgramAb <sfDir> [reps]
  */
object NgramAb {
  private val H = 12
  private val BAND = 3
  private val CAP = 65536

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
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

    def docs = graft.Queries.spread(
        graft.Tables(spark, sfDir, "documents"), col("doc_id"))
      .select(col("doc_id"),
        substring(col("text"), 1, CAP).as("text"))

    def perOld(): DataFrame = {
      val sh = docs.select(col("doc_id"),
          explode(Similarity.charShingles(col("text"), 5)).as("sh"))
        .withColumn("hb", Similarity.minhashBase(col("sh")))
      val aggs = Seq(collect_list(col("hb")).as("hbs"),
        count(lit(1)).as("n")) ++
        (0 until H).map(i => Similarity.minhashAgg(col("hb"), i).as(s"m$i"))
      sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }

    def perNew(): DataFrame = docs.select(col("doc_id"),
        Similarity.minhashProfile(
          Similarity.charShingles(col("text"), 5), H).as("p"))
      .where(col("p").isNotNull)
      .select(Seq(col("doc_id"), col("p.hbs").as("hbs"),
        col("p.n").as("n")) ++
        (0 until H).map(i => col("p.ms").getItem(i).as(s"m$i")): _*)

    def full(per0: DataFrame): DataFrame = {
      val per = per0.cache()
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
      candSized.join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter",
          size(array_intersect(col("a_hbs"), col("b_hbs"))).cast("long"))
        .withColumn("jaccard",
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "per_old" -> (() => perOld()),
      "per_new" -> (() => perNew()),
      "full_old" -> (() => full(perOld())),
      "full_new" -> (() => full(perNew())))

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
        s""""$k":[${v.map(x => math.round(x * 1000) / 1000.0)
          .mkString(",")}]""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"ngram_ab","reps":$reps,""" +
      s""""wall":${j(wall)},"cpu":${j(cpu)}}""")
    spark.stop()
  }
}
