package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Wave-2 same-JVM interleaved A/B (r16): settle the two wave-1
  * full-board deltas that touched code (everything else that moved is
  * on untouched queries = environment noise).
  *
  *   F) lm_bigram_score: wave-1 pinned the three-consumer bigram
  *      occurrence frame with a lazy localCheckpoint (the ccnet win);
  *      the board bench says 0.72 -> 1.10 s — is the pin itself slower
  *      than recomputing the scalar explode three times?
  *   G) exact-substr clean(): wave-1 moved windows() to the spanHashes
  *      scalar; incremental_substr read 1.35 -> 1.54 s in the board.
  *      Legacy arm is the r15 explode(sequence)+slice windows form,
  *      verbatim, through the same clean() back half.
  *
  * Usage: runMain graft.tools.OptAb16b <sfDir> [reps]
  */
object OptAb16b {
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

    // ---------- F) lm_bigram_score: pinned (shipped) vs unpinned ----------
    def lmCore(pin: Boolean): DataFrame = {
      val bi0 = docs
        .select(col("doc_id"),
          explode(graft.functions.Similarity.wordGramsAll(col("text"), 2))
            .as("g"))
        .select(col("doc_id"), substring_index(col("g"), " ", 1).as("w"),
          col("g"))
      val bi = if (pin) bi0.localCheckpoint(false) else bi0
      val c1 = bi.groupBy("w").agg(count(lit(1)).as("cw"))
      val c2 = bi.groupBy("g").agg(count(lit(1)).as("cg"))
      bi.join(c2, "g").join(c1, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(expr("cw DIV cg")).as("lm_score"))
        .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
          expr("(lm_score * 10000) DIV n_bigrams").as("lm_per_bigram_bp"))
    }

    // ------ G) exact-substr clean(): scalar windows vs legacy windows ------
    def legacyWindows(d: DataFrame, W: Int): DataFrame =
      d.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= W)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("ws")) - W)).as("pos"),
          col("ws"))
        .select(col("doc_id"), col("pos"),
          Hashing.md5Long(concat_ws(" ",
            slice(col("ws"), col("pos") + 1, lit(W)))).as("h"))
    def substrClean(windows: DataFrame => DataFrame): DataFrame = {
      val W = 15
      val dupH = windows(docs).groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") > 1).select("h")
      graft.ops.ExactSubstr.cleanFromStarts(docs,
        windows(docs).join(dupH, "h").select(col("doc_id"), col("pos")), W)
    }
    def substrLegacy(): DataFrame = substrClean(legacyWindows(_, 15))
    def substrScalar(): DataFrame =
      substrClean(graft.ops.ExactSubstr.windows(_, 15))

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "lm_pinned" -> (() => lmCore(pin = true)),
      "lm_unpinned" -> (() => lmCore(pin = false)),
      "substr_scalar" -> (() => substrScalar()),
      "substr_legacy" -> (() => substrLegacy()))

    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    for (i <- arms.indices by 2) {
      require(sortedRows(arms(i)._2()) == sortedRows(arms(i + 1)._2()),
        s"${arms(i)._1} vs ${arms(i + 1)._1}: arms disagree")
      println(s"[referee] ${arms(i)._1} == ${arms(i + 1)._1}")
    }

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
    println(s"""{"metric":"opt_ab16b","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
