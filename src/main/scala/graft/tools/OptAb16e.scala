package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-3 same-JVM interleaved A/B (r16): the redundant corpus-total
  * pass. rarity_score, source_drift and curriculum_order each computed
  * the corpus token total with a SECOND full explode+count over the
  * corpus (`tf.agg(count(1))`) although the total is an algebraic fold
  * of the vocabulary counts they already aggregate
  * (`n_total = Σ cnt`): the rewire folds the vocab frame instead, and
  * the vocab-keyed Exchange is shared with the join consumer
  * (ReusedExchange), so the corpus explode+partial-count executes once.
  *
  * Arms differ ONLY in the tot subtree; referee compares final sorted
  * rows per pair.
  *
  * Usage: runMain graft.tools.OptAb16e <sfDir> [reps]
  */
object OptAb16e {
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

    def docs: DataFrame = graft.Tables(spark, sfDir, "documents")

    def rarity(totFromCnt: Boolean): DataFrame = {
      val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
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

    def drift(totFromCnt: Boolean): DataFrame = {
      val tf = docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val glob = tf.groupBy("w").agg(count(lit(1)).as("gcnt"))
      val tot =
        if (totFromCnt) glob.agg(sum(col("gcnt")).as("n_total"))
        else tf.agg(count(lit(1)).as("n_total"))
      val vocab = glob.crossJoin(broadcast(tot))
        .orderBy(desc("gcnt"), asc("w")).limit(50)
        .select(col("w"), expr("gcnt * 10000 div n_total").as("exp_bp"))
      val srcTot = tf.groupBy("source").agg(count(lit(1)).as("n_tokens"))
      val obs = tf.join(broadcast(vocab.select("w")), "w")
        .groupBy("source", "w").agg(count(lit(1)).as("obs"))
      srcTot.crossJoin(broadcast(vocab))
        .join(obs, Seq("source", "w"), "left")
        .select(col("source"), col("n_tokens"), col("exp_bp"),
          coalesce(col("obs"), lit(0L)).as("obs"),
          expr("coalesce(obs, 0) * 10000 div n_tokens").as("obs_bp"))
        .groupBy("source")
        .agg(max(col("n_tokens")).as("n_tokens"),
          sum(expr("(obs_bp - exp_bp) * (obs_bp - exp_bp)" +
            " div greatest(exp_bp, 1)")).as("drift_score"),
          sum(when(col("obs") === 0, 1L).otherwise(0L)).as("n_absent"))
    }

    /** curriculumAssign with the legacy tot pass (everything else
      * byte-equal to the shipped body). */
    def curriculumLegacy(d: DataFrame): DataFrame = {
      val tf = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val cnt = tf.groupBy("w").agg(count(lit(1)).as("cnt"))
      val tot = tf.agg(count(lit(1)).as("n_total"))
      val diff = tf.join(cnt, "w").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(expr("""(least(sum(least(n_total DIV cnt, 1000000000)),
              100 * count(1) + 1) * 10000) DIV count(1)""")
          .as("diff_bp"))
        .withColumn("diff_q", least(col("diff_bp"), lit(1000000L)))
        .localCheckpoint(false)
      val hist = diff.groupBy("diff_q").agg(count(lit(1)).as("hcnt"))
      val ntot = hist.agg(sum("hcnt").as("ntot"))
      val bk = graft.ops.PrefixSum.groupedRunningSum(
          hist.crossJoin(broadcast(ntot)),
          lit(1), col("diff_q"), col("hcnt"), "cum")
        .select(col("diff_q"),
          expr("((cum - hcnt) * 4) DIV ntot").as("bucket"))
      val bucketed = diff.join(broadcast(bk), "diff_q")
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      graft.ops.PrefixSum.groupedRunningSum(bucketed,
          struct(col("bucket"), col("source")), col("doc_id"),
          lit(1L), "intra")
        .select(col("doc_id"), col("source"), col("diff_bp"),
          col("bucket").cast("int").as("bucket"), col("intra"))
    }

    def curDocs: DataFrame = graft.Queries.spread(docs, col("doc_id"))
      .select(col("doc_id"), col("text"), col("source"))

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "rarity_legacy" -> (() => rarity(false)),
      "rarity_new" -> (() => rarity(true)),
      "drift_legacy" -> (() => drift(false)),
      "drift_new" -> (() => drift(true)),
      "curriculum_legacy" -> (() => curriculumLegacy(curDocs)),
      "curriculum_new" ->
        (() => graft.QueriesPipeline.curriculumAssign(curDocs)))

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
    println(s"""{"metric":"opt_ab16e","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
