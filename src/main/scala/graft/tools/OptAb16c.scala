package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-2 same-JVM interleaved A/B (r16): the BM25 document-length
  * rewire. `Bm25.scores` / bm25_search computed dl by tokenizing the
  * corpus a SECOND time (explode(split) + filter + groupBy count);
  * wave 2 moves dl into the document scan projection via the
  * zero-copy `nonEmptyTokens` scalar. Arms build the FULL bm25_search
  * frame (terms selection, tf, df, score) differing only in the dl
  * subtree, at ×1 and ×10 in-plan inflation (the corpus-pass term
  * scales with data mass; at sf0.1 it is scheduling-floor noise).
  *
  * Usage: runMain graft.tools.OptAb16c <sfDir> [reps] [scales]
  */
object OptAb16c {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val scales = (if (args.length > 2) args(2) else "1,10")
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

    def bm25(d: DataFrame, scalarDl: Boolean): DataFrame = {
      val toks = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1)
      val dl =
        if (scalarDl)
          d.select(col("doc_id"),
            graft.functions.Similarity.nonEmptyTokens(col("text")).as("dl"))
            .where(col("dl") > 0)
        else toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        expr("sum(dl) div count(1)").as("avgdl"))
      val terms = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("w")).limit(12)
        .orderBy(asc("cnt"), desc("w")).limit(3)
        .select("w")
      val tf = toks.join(broadcast(terms), "w")
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      // integer-exact score term (DIV everywhere): the referee compares
      // the two arms' rows, so the arithmetic must be order-independent
      tf.join(broadcast(dfq), "w")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("w"),
          expr("""((2 * (length(bin((n_docs - df + 1) * 1000000
                    DIV (df + 1))) - 1)) * tf * 2500000)
                  DIV (tf * 1000000 + 500000
                    + (1500000 * dl) DIV greatest(avgdl, 1))""").as("p"))
        .groupBy("doc_id").agg(sum(col("p")).as("score_bp"),
          count(lit(1)).as("n_terms"))
    }

    for (scale <- scales) {
      val d = graft.Inflate(
          graft.Tables(spark, sfDir, "documents"), "documents", scale)
        .select(col("doc_id"), col("text"))
      val arms: Seq[(String, () => DataFrame)] = Seq(
        s"bm25x${scale}_legacy" -> (() => bm25(d, scalarDl = false)),
        s"bm25x${scale}_scalar" -> (() => bm25(d, scalarDl = true)))

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
      def j(m: collection.Map[String, Vector[Double]]) = m.toSeq
        .sortBy(_._1)
        .map { case (k, v) =>
          s""""$k":${math.round(v.min * 1000) / 1000.0}""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"opt_ab16c","sf":"$sfDir","scale":$scale,""" +
        s""""reps":$reps,"wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    }
    spark.stop()
  }
}
