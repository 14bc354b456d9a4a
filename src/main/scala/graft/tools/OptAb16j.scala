package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Similarity}

/** Wave-3 same-JVM interleaved A/B (r16): the simhash signature pass.
  * Legacy arm = per-token explode + shuffle + 60-vote aggregate (the
  * r15 shape); new arm = the SHIPPED query body (one row-local
  * ShingleOps.simhash60 scalar, no per-token Exchange). Referee
  * compares final sorted rows.
  *
  * Usage: runMain graft.tools.OptAb16j <sfDir> [reps]
  */
object OptAb16j {
  private val BITS = 60
  private val BANDS = 4
  private val MAXHAM = 3

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

    /** The r15 query body, byte-equal to the shipped one except the
      * signature pass. */
    def legacy(): DataFrame = {
      val d = graft.Queries.spread(
        graft.Tables(spark, sfDir, "documents"), col("doc_id"))
      val tok = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) >= 2)
        .withColumn("h60", Hashing.md5Long(col("token")))
      val voteCols = (0 until BITS).map { i =>
        sum(when(expr(s"(shiftright(h60, $i) & 1) = 1"), 1).otherwise(-1))
          .as(s"v$i")
      }
      val sh = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"),
          (0 until BITS).map(i =>
            when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash"))
        .cache()
      val bandW = BITS / BANDS
      val bandCols = (0 until BANDS).map { b =>
        struct(lit(b).as("band"),
          expr(s"(shiftright(simhash, ${b * bandW}) & ${(1L << bandW) - 1})")
            .as("bv"))
      }
      val bands = sh.select(col("doc_id"),
          explode(array(bandCols: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"),
          col("bb.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("a_id"),
          col("simhash").as("ha")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"),
          col("simhash").as("hb")), "b_id")
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= MAXHAM)
        .select(col("a_id"), col("b_id"), col("hamming"))
    }

    def shipped(): DataFrame =
      graft.SparkEntry.queries("simhash")(spark, sfDir)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "simhash_legacy" -> (() => legacy()),
      "simhash_scalar" -> (() => shipped()))

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
    println(s"""{"metric":"opt_ab16j","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
