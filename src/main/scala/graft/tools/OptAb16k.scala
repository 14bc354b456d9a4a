package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-3 same-JVM interleaved A/B (r16): the centroid featurization
  * pass (centroid_train / centroid_score / classify_sql). Legacy arm
  * = per-token explode + (doc, y, f) hash-aggregate + bias-row union
  * (the r15 centroidFeatures); new arm = the SHIPPED
  * ShingleOps.centroidFeat scalar. Both arms run the full
  * centroid_score shape (featurize → localCheckpoint → train + score)
  * so the measured delta is what the bench sees. Referee compares
  * final sorted rows.
  *
  * Usage: runMain graft.tools.OptAb16k <sfDir> [reps]
  */
object OptAb16k {
  private val CentF = 64
  private val CentGate = 51
  private val CentS = 1L << 20

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

    def docs: DataFrame = graft.Queries.spread(
      graft.Tables(spark, sfDir, "documents"), col("doc_id"))

    /** The r15 featurization, byte-equal to the replaced body. */
    def featLegacy(d: DataFrame): DataFrame = {
      val labeled = d.select(col("doc_id"),
        when(size(split(col("text"), " ")) >= CentGate, lit(1L))
          .otherwise(lit(-1L)).as("y"),
        col("text"))
      labeled
        .select(col("doc_id"), col("y"),
          explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) >= 1)
        .select(col("doc_id"), col("y"),
          pmod(graft.Queries.md5Long(col("tok")), lit(CentF.toLong)).as("f"))
        .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("x"))
        .unionByName(labeled.select(col("doc_id"), col("y"),
          lit(CentF.toLong).as("f"), lit(1L).as("x")))
    }

    /** centroid_score downstream of a given feat frame (the shipped
      * model + score shape, byte-equal). */
    def score(feat0: DataFrame): DataFrame = {
      val feat = feat0.localCheckpoint()
      val cls = feat.where(col("f") === CentF.toLong)
        .groupBy()
        .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"),
          sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nneg"))
      val fs = feat.groupBy("f")
        .agg(sum(when(col("y") === 1L, col("x")).otherwise(0L)).as("spos"),
          sum(when(col("y") === -1L, col("x")).otherwise(0L)).as("sneg"))
      val model = spark.range(0, CentF + 1L).toDF("f")
        .join(fs, Seq("f"), "left")
        .crossJoin(broadcast(cls))
        .select(col("f"),
          expr(s"($CentS * coalesce(spos, cast(0 as bigint))) div npos")
            .as("mu_pos"),
          expr(s"($CentS * coalesce(sneg, cast(0 as bigint))) div nneg")
            .as("mu_neg"))
      val nrm = model.groupBy()
        .agg(sum(col("mu_pos") * col("mu_pos") -
          col("mu_neg") * col("mu_neg")).as("nrm"))
      feat.join(broadcast(model), "f")
        .groupBy("doc_id")
        .agg(max(col("y")).as("y"),
          sum(col("x") * (col("mu_pos") - col("mu_neg"))).as("xd"))
        .crossJoin(broadcast(nrm))
        .select(col("doc_id"),
          (lit(2L * CentS) * col("xd") - col("nrm")).as("score"),
          when(lit(2L * CentS) * col("xd") - col("nrm") > 0, lit(1L))
            .otherwise(lit(-1L)).as("pred"),
          col("y"))
    }

    def shipped(): DataFrame =
      graft.SparkEntry.queries("centroid_score")(spark, sfDir)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cent_legacy" -> (() => score(featLegacy(docs))),
      "cent_scalar" -> (() => shipped()))

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
    println(s"""{"metric":"opt_ab16k","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
