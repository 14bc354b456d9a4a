package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Similarity}

/** ngram_jaccard LSH band-layout sensitivity probe (r15 verdict #6):
  * the candidate-VERIFY stage is the operator's 100 TB cost center
  * (×100 CPU grew ~16× in SCALE_r15opt — real near-dup mass), so this
  * measures how the 12-minhash budget split — 4 bands × 3 rows
  * (shipped) vs 6 bands × 2 rows — moves candidate mass, the
  * size-prefilter survivor mass, verify cost, and found pairs at
  * ×1/×10/×100 in-plan inflation.
  *
  * MEASUREMENT ONLY: band layout is answer-affecting (it sets
  * candidate recall, and verified pairs are the declared output of
  * ngram_jaccard), so the query keeps 4×3 regardless; this artifact
  * records the trade for a future BUILD round.
  *
  * Usage: runMain graft.tools.BandProbe <sfDir> [scales (csv, def 1,10,100)]
  * Prints one JSON line per (scale, layout).
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val scales = (if (args.length > 1) args(1) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
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

    val H = 12
    val CAP = 65536 // QueriesText.NGRAM_TEXT_CAP

    for (scale <- scales) {
      val d0 = graft.Inflate(
        graft.Tables(spark, sfDir, "documents"), "documents", scale)
      val d = d0.select(col("doc_id"),
        substring(col("text"), 1, CAP).as("text"))
      val per = d.where(col("text").isNotNull)
        .select(col("doc_id"),
          Similarity.minhashProfile(
            Similarity.charShingles(col("text"), 5), H).as("p"))
        .select(Seq(col("doc_id"), col("p.hbs").as("hbs"),
          col("p.n").as("n")) ++
          (0 until H).map(i => col("p.ms").getItem(i).as(s"m$i")): _*)
        .localCheckpoint(false)
      for (bandRows <- Seq(3, 2)) {
        val nBands = H / bandRows
        val bandCols = (0 until nBands).map { b =>
          val ms = (b * bandRows until (b + 1) * bandRows)
            .map(i => col(s"m$i"))
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
          .localCheckpoint(false)
        val sz = per.select(col("doc_id"), col("n"))
        val candSized = cand
          .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")),
            "a_id")
          .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")),
            "b_id")
          .filter(least(col("na"), col("nb")) * 2 >=
            greatest(col("na"), col("nb")))
        val sa = per.select(col("doc_id").as("a_id"), col("hbs").as("a_hbs"))
        val sb = per.select(col("doc_id").as("b_id"), col("hbs").as("b_hbs"))
        val out = candSized.join(sa, "a_id").join(sb, "b_id")
          .withColumn("inter",
            size(array_intersect(col("a_hbs"), col("b_hbs"))).cast("long"))
          .withColumn("jaccard",
            round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 4))
          .filter(col("jaccard") >= 0.5)
        meter.reset()
        val t0 = System.nanoTime()
        val nCand = cand.count()
        val nSized = candSized.count()
        val nOut = out.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.ListenerBridge.drain(
          spark.sparkContext)
        println(s"""{"metric":"band_probe","scale":$scale,""" +
          s""""layout":"${nBands}x$bandRows","n_candidates":$nCand,""" +
          s""""n_after_size_prefilter":$nSized,"n_pairs_found":$nOut,""" +
          s""""wall_sec":${math.round(wall * 1000) / 1000.0},""" +
          s""""cpu_sec":${math.round(meter.cpuSec * 1000) / 1000.0},""" +
          s""""shuffle_mb":${math.round(meter.mb * 100) / 100.0}}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
