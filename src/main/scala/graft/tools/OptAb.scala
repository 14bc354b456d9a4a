package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Same-JVM interleaved A/B for the r15 optimization primitives (the
  * AsofAb methodology: container spread between runs is ~24%, so only
  * in-JVM interleaved ratios are trustworthy).
  *
  *   A) md5Long: legacy conv(substring(md5(c),1,15),16,10) column chain
  *      vs the StaticInvoke HashOps scalar, over every 15-word window
  *      of sf docs (the span/exact-substr hashing shape).
  *   B) word 8-grams: legacy posexplode + 7×lead window + distinct vs
  *      the wordGramsDistinct scalar (the decontamination shape).
  *   C) winnowing: legacy two-window + distinct form vs the winnowMins
  *      scalar.
  *
  * Usage: runMain graft.tools.OptAb <sfDir> [reps]
  * Prints one JSON line with min-of-reps wall and executor CPU per arm.
  */
object OptAb {
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

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def legacyMd5Long(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    // 15-word windows, both hash arms over the identical gram strings
    def windows(d: DataFrame) = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 15)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ws")) - 15)).as("p"), col("ws"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("ws"), col("p") + 1, lit(15))).as("g"))

    def gramsLegacy(d: DataFrame) = {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val leads = (1 to 7).map(j => lead(col("w"), j).over(w).as(s"w$j"))
      val gramCols = col("w") +: (1 to 7).map(j => col(s"w$j"))
      d.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id") +: col("w") +: leads: _*)
        .where(col("w7").isNotNull)
        .select(col("doc_id"), concat_ws(" ", gramCols: _*).as("g"))
        .distinct()
    }

    def winnowLegacy(d: DataFrame) = {
      val wp = Window.partitionBy("doc_id").orderBy("pos")
      val toks = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val grams = toks.select(col("doc_id"), col("pos"),
          concat_ws(" ", col("w"), lead(col("w"), 1).over(wp),
            lead(col("w"), 2).over(wp), lead(col("w"), 3).over(wp),
            lead(col("w"), 4).over(wp)).as("g"),
          lead(col("w"), 4).over(wp).isNotNull.as("full_gram"))
        .where(col("full_gram"))
        .select(col("doc_id"), col("pos"),
          legacyMd5Long(col("g")).as("h"))
      grams.select(col("doc_id"), col("pos"),
          min(col("h")).over(wp.rowsBetween(0, 3)).as("mh"),
          lead(col("h"), 3).over(wp).isNotNull.as("full_win"))
        .where(col("full_win"))
        .select(col("doc_id"), col("mh")).distinct()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          sum(col("mh") % 1000000000L).as("fp_digest"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "md5long_legacy" -> (() => windows(docs)
        .select(col("doc_id"), legacyMd5Long(col("g")).as("h"))
        .groupBy("doc_id").agg(sum(col("h") % 1000000000L).as("s"))),
      "md5long_scalar" -> (() => windows(docs)
        .select(col("doc_id"),
          graft.functions.Hashing.md5Long(col("g")).as("h"))
        .groupBy("doc_id").agg(sum(col("h") % 1000000000L).as("s"))),
      "grams8_legacy" -> (() => gramsLegacy(docs)
        .groupBy("doc_id").agg(count(lit(1)).as("n"))),
      "grams8_scalar" -> (() => graft.QueriesPipeline.wordGrams8(docs)
        .groupBy("doc_id").agg(count(lit(1)).as("n"))),
      "winnow_legacy" -> (() => winnowLegacy(docs)),
      "winnow_scalar" -> (() => docs.select(col("doc_id"),
          explode(graft.functions.Similarity.winnowMins(col("text"), 5, 4))
            .as("mh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          sum(col("mh") % 1000000000L).as("fp_digest"))))

    // equality referee: every pair of arms must agree row-for-row
    def sortedRows(df: DataFrame): Seq[String] =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    require(sortedRows(arms(0)._2()) == sortedRows(arms(1)._2()),
      "md5long arms disagree")
    require(sortedRows(arms(2)._2()) == sortedRows(arms(3)._2()),
      "grams8 arms disagree")
    require(sortedRows(arms(4)._2()) == sortedRows(arms(5)._2()),
      "winnow arms disagree")

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
    println(s"""{"metric":"opt_ab","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
