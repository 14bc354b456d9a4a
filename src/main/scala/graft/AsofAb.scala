package graft

import org.apache.spark.sql.SparkSession

/** Same-container A/B of the as-of carry (r13 verdict item #2): the
  * two-phase PrefixSum range-split scan vs the per-key window, on the
  * SAME input in ONE JVM with interleaved reps — so the ~24% container
  * spread that polluted the r13 cross-artifact comparison cancels out.
  * The recorded constant in [[graft.ops.AsofJoin]]'s scaladoc cites
  * the committed artifact this prints (ASOF_AB_rN.json).
  *
  * Interleaving matters: A,B,A,B,... means any slow drift in the
  * container's effective CPU speed hits both phrasings equally, and
  * min-of-reps strips the per-rep scheduling noise. Executor CPU time
  * (spread-invariant, see Bench header) is recorded alongside wall. */
object AsofAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "5").toInt.max(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val ev = Tables(spark, sfDir, "events")
    def run(twoPhase: Boolean): (Double, Double) = {
      meter.reset()
      val t0 = System.nanoTime()
      QueriesStream.asofEnriched(ev, twoPhase = twoPhase)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (dt, meter.cpuSec)
    }
    run(twoPhase = true); run(twoPhase = false) // untimed warmup, both paths
    val pairs = (1 to reps).map(_ => (run(twoPhase = true),
      run(twoPhase = false)))
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val (tp, w) = (pairs.map(_._1), pairs.map(_._2))
    val (tpMin, wMin) = (tp.map(_._1).min, w.map(_._1).min)
    val (tpCpu, wCpu) = (tp.map(_._2).min, w.map(_._2).min)
    println(s"""{"metric":"asof_ab","sf":"$sfDir","reps":$reps,""" +
      s""""two_phase_sec":${tp.map(p => r3(p._1)).mkString("[", ",", "]")},""" +
      s""""window_sec":${w.map(p => r3(p._1)).mkString("[", ",", "]")},""" +
      s""""two_phase_min":${r3(tpMin)},"window_min":${r3(wMin)},""" +
      s""""wall_ratio":${r3(tpMin / wMin)},""" +
      s""""two_phase_cpu":${r3(tpCpu)},"window_cpu":${r3(wCpu)},""" +
      s""""cpu_ratio":${r3(tpCpu / wCpu)}}""")
    spark.stop()
  }
}
