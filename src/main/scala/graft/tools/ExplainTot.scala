package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Executed-plan evidence for the r16 redundant-total-pass rewire
  * (rarity_score shape): the static formatted dump duplicates the
  * vocab subtree under the new tot (AQE reuse is a RUNTIME effect),
  * so this dumps the EXECUTED plan of both arms — the legacy arm pays
  * a separate corpus explode+count for tot, the new arm's tot shows a
  * ShuffleQueryStage REUSE of the vocabulary exchange.
  *
  * Usage: runMain graft.tools.ExplainTot <sfDir> <outDir>
  */
object ExplainTot {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def rarity(totFromCnt: Boolean): DataFrame = {
      val tf = graft.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val cnt = tf.groupBy("w").agg(count(lit(1)).as("cnt"))
      val tot =
        if (totFromCnt) cnt.agg(sum(col("cnt")).as("n_total"))
        else tf.agg(count(lit(1)).as("n_total"))
      tf.join(cnt, "w").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("n_total DIV cnt")).as("rarity"))
        .select(col("doc_id"), col("n_tokens"), col("rarity"),
          expr("(rarity * 10000) DIV n_tokens").as("rarity_per_token_bp"))
    }

    for ((name, arm) <- Seq("before" -> false, "after" -> true)) {
      val df = rarity(arm)
      // collect() drives df's OWN QueryExecution, so the AQE plan below
      // is the final one with runtime stage reuse visible (a noop write
      // would execute a separate QueryExecution and leave this one
      // unplanned, isFinalPlan=false)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      Files.writeString(
        Paths.get(s"$outDir/rarity_score_executed_$name.txt"), p)
      val reused = p.linesIterator.count(_.contains("ReusedQueryStage")) +
        p.linesIterator.count(_.contains("reuses"))
      val gens = p.linesIterator.count(_.trim.startsWith("+- Generate") ) +
        p.linesIterator.count(_.trim.startsWith(":- Generate"))
      println(s"[executed] $name: reusedStages~$reused generateNodes~$gens" +
        s" -> rarity_score_executed_$name.txt")
    }
    spark.stop()
  }
}
