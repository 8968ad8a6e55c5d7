package graft

/** N-vs-4N scaling study (BASELINE.json north_rule: throughput scaling
  * efficiency >= 0.8 between two cluster sizes; sandboxed as local[N] vs
  * local[4N] on the same input — see BASELINE.md).
  *
  * Runs ONLY the rollup throughput job at the given parallelism; the shell
  * harness (tools/run_scaling.sh) invokes it twice in separate JVMs and
  * computes efficiency = pps(4N) / (4 * pps(N)).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "4000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Bench.session(cpus)
    // one full-size untimed warmup (inside minOfReps): JIT + codegen + page
    // cache settle only after a complete pass; then best-of-reps — the
    // sandbox is a shared VM (nonzero steal time), so the minimum is the
    // least-contended sample
    val secs = {
      Bench.rollupJob(spark, rows) // warmup
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.rollupJob(spark, rows)
        (System.nanoTime() - t0) / 1e9
      }
    }
    val sec = secs.min
    println(f"""{"cpus":$cpus,"points":$rows,"sec":$sec%.3f,"points_per_sec":${rows / sec}%.0f,"all_secs":${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
