package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE depth ladder (r13 verdict item #3): prove training time scales
  * in the MERGE DEPTH K and the VOCABULARY, not the corpus.
  *
  * Two axes in one JVM, one JSON line (commit as BPE_DEPTH_rN.json):
  *  - K-ladder on the real corpus vocabulary (sf dir's documents):
  *    the corpus-sized work — ONE word-count shuffle — is paid once,
  *    outside the ladder (`vocab_build_sec`); each K then re-runs
  *    [[QueriesPipeline.bpeLoop]] on the materialized vocab. Wall
  *    must grow ∝ K (per-round cost is vocab-bounded and constant).
  *  - one big-vocab run (`SPARK_GRAFT_BPE_VOCAB`, default 100k
  *    synthetic words of 32 hex chars) at a fixed K: the per-round
  *    constant scales with vocabulary size, the knob a real 32k-merge
  *    tokenizer turns, while the corpus never re-enters.
  *
  * Executor CPU (spread-invariant, see Bench header) recorded
  * alongside wall for every rung. */
object BpeDepthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ks = sys.env.getOrElse("SPARK_GRAFT_BPE_KS", "8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val bigVocab = sys.env.getOrElse("SPARK_GRAFT_BPE_VOCAB", "100000").toLong
    val out = if (args.nonEmpty) Some(args(0)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    def timed[A](f: => A): (A, Double, Double, Double) = {
      meter.reset()
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (a, dt, meter.cpuSec, meter.mb)
    }
    // the ONE corpus-sized pass: word count -> materialized vocab
    val (vocab, vocabSec, vocabCpu, vocabMb) = timed {
      QueriesPipeline.bpeVocab(Tables(spark, sfDir, "documents"))
        .localCheckpoint()
    }
    val nVocab = vocab.count()
    def ladder(v: org.apache.spark.sql.DataFrame, k: Int)
        : ((Int, Int), Double, Double, Double) = {
      val (learned, sec, cpu, mb) = timed {
        val (merges, _) = QueriesPipeline.bpeLoop(v, k)
        // elections are collected inside the loop (driver-resident
        // merge table by design); count learned merges (≤ k at
        // convergence) and PASSES — the r15 batching means
        // passes ≤ merges, and wall ∝ passes
        (merges.map(_.count()).sum.toInt, merges.length)
      }
      (learned, sec, cpu, mb)
    }
    QueriesPipeline.bpeLoop(vocab, 2) // untimed warmup
    val rungs = ks.map { k =>
      val ((learned, passes), sec, cpu, mb) = ladder(vocab, k)
      s"""{"k":$k,"learned":$learned,"passes":$passes,"sec":${r3(sec)},""" +
        s""""cpu_sec":${r3(cpu)},"shuffle_mb":${r3(mb)}}"""
    }
    // ENCODE rung: replay the deepest rung's frozen merges on the
    // corpus vocab — per-merge cost must match training's per-round
    // constant (the broadcast-pair phrasing keeps one codegen class
    // across all K passes; literal pairs would mint K classes)
    val deepest = ks.max
    val (mergeFrames, _) = QueriesPipeline.bpeLoop(vocab, deepest)
    val frozen = mergeFrames.flatMap(_.collect().toSeq)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt")))
    val (encLearned, encSec, encCpu, encMb) = timed {
      val enc = QueriesPipeline.bpeEncode(vocab, frozen)
      enc.count().toInt
    }
    // vocab axis: synthetic big vocabulary, fixed K — corpus absent
    val big = spark.range(bigVocab)
      .select(md5(col("id").cast("string")).as("word"),
        (col("id") % 100 + 1).as("freq"))
      .localCheckpoint()
    val bigK = sys.env.getOrElse("SPARK_GRAFT_BPE_BIG_K", "8").toInt
    val ((bigLearned, bigPasses), bigSec, bigCpu, bigMb) = ladder(big, bigK)
    val line = s"""{"metric":"bpe_depth","sf":"$sfDir","n_vocab":$nVocab,""" +
      s""""vocab_build_sec":${r3(vocabSec)},"vocab_build_cpu":${r3(vocabCpu)},""" +
      s""""vocab_build_shuffle_mb":${r3(vocabMb)},""" +
      s""""ladder":${rungs.mkString("[", ",", "]")},""" +
      s""""encode":{"k":${frozen.length},"final_tokens":$encLearned,""" +
      s""""sec":${r3(encSec)},"cpu_sec":${r3(encCpu)},""" +
      s""""shuffle_mb":${r3(encMb)}},""" +
      s""""batch":${QueriesPipeline.BPE_B},""" +
      s""""big_vocab":{"n_words":$bigVocab,"k":$bigK,"learned":$bigLearned,""" +
      s""""passes":$bigPasses,"sec":${r3(bigSec)},"cpu_sec":${r3(bigCpu)},""" +
      s""""shuffle_mb":${r3(bigMb)}}}"""
    println(line)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
