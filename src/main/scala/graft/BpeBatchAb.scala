package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-container A/B of batched vs one-merge-per-pass BPE training
  * (r15): `bpeLoop(batch = B)` vs `bpeLoop(batch = 1)` on the SAME
  * synthetic vocabulary in ONE JVM with interleaved reps — the AsofAb
  * discipline, because the r14 round established that cross-artifact
  * constants on this container drift ~2× (ASOF_AB_r14 corrected a
  * "~2×" estimate to 2.56×/12.9×). The recorded ratio is what
  * [[QueriesPipeline.bpeLoop]]'s batching actually buys at tokenizer
  * scale; the BPE_DEPTH ladders hold the depth-axis evidence.
  *
  * The vocabulary is the BpeDepthProbe big-vocab rung (md5 hex words,
  * a WORST case for the disjoint-prefix batch width — 16 token types
  * to share at round 1) so the ratio is a floor, not a showcase.
  * Exactness is not re-proven here (BpeDsirSpec A/Bs the merge tables
  * against the scalar Sennrich reference to depth 128); this measures
  * cost only, with executor CPU (spread-invariant) beside wall. */
object BpeBatchAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt.max(2)
    val k = sys.env.getOrElse("SPARK_GRAFT_AB_K", "64").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_AB_B", "8").toInt
    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_VOCAB", "100000").toLong
    // hex (default): md5 words, near-uniform freqs — the 16-char
    // WORST case for disjoint-prefix width. zipf: base-26 letter
    // words (variable length, 26-char alphabet) with freq ∝ 1/rank —
    // the regime of a natural-language vocabulary, where elections
    // tie less and the batch should fill wider.
    val shape = sys.env.getOrElse("SPARK_GRAFT_AB_SHAPE", "hex")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val vocab = (shape match {
      case "zipf" =>
        import spark.implicits._
        def word(id: Long): String = {
          var n = id; val sb = new StringBuilder
          do { sb.append(('a' + (n % 26)).toInt.toChar); n /= 26 }
          while (n > 0)
          sb.toString
        }
        (0L until nWords)
          .map(id => (word(id), nWords / (id + 1) + 1)).toDF("word", "freq")
      case _ => spark.range(nWords)
        .select(md5(col("id").cast("string")).as("word"),
          (col("id") % 100 + 1).as("freq"))
    }).localCheckpoint()
    def run(b: Int): (Double, Double, Int) = {
      meter.reset()
      val t0 = System.nanoTime()
      val (merges, _) = QueriesPipeline.bpeLoop(vocab, k, batch = b)
      val learned = merges.map(_.count()).sum.toInt
      require(learned == k, s"batch=$b learned $learned of $k")
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (dt, meter.cpuSec, merges.length)
    }
    run(batch); run(1) // untimed warmup, both paths
    val pairs = (1 to reps).map(_ => (run(batch), run(1)))
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val (bt, sq) = (pairs.map(_._1), pairs.map(_._2))
    val (btMin, sqMin) = (bt.map(_._1).min, sq.map(_._1).min)
    val (btCpu, sqCpu) = (bt.map(_._2).min, sq.map(_._2).min)
    println(s"""{"metric":"bpe_batch_ab","k":$k,"batch":$batch,""" +
      s""""n_words":$nWords,"shape":"$shape","reps":$reps,""" +
      s""""batched_sec":${bt.map(p => r3(p._1)).mkString("[", ",", "]")},""" +
      s""""sequential_sec":${sq.map(p => r3(p._1)).mkString("[", ",", "]")},""" +
      s""""batched_passes":${bt.head._3},"sequential_passes":${sq.head._3},""" +
      s""""batched_min":${r3(btMin)},"sequential_min":${r3(sqMin)},""" +
      s""""wall_ratio":${r3(sqMin / btMin)},""" +
      s""""batched_cpu":${r3(btCpu)},"sequential_cpu":${r3(sqCpu)},""" +
      s""""cpu_ratio":${r3(sqCpu / btCpu)}}""")
    spark.stop()
  }
}
