package graft

/** N-vs-4N scaling study (BASELINE.json north_rule: throughput scaling
  * efficiency >= 0.8 between two cluster sizes; sandboxed as local[N] vs
  * local[4N] on the same input — see BASELINE.md).
  *
  * Runs ONLY the rollup throughput job at the given parallelism; the shell
  * harness (tools/run_scaling.sh) invokes it twice in separate JVMs and
  * computes efficiency = pps(4N) / (4 * pps(N)).
  *
  * `SPARK_GRAFT_SHARD=i/m` restricts the job to the i-th of m url-hash
  * shards — the executor stand-in mode for tools/run_multijvm.sh, where m
  * concurrent 8-core JVMs (separate heaps, like a 4-executor cluster
  * stage) each own a disjoint shard of the SAME pages table.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "4000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val shard = sys.env.get("SPARK_GRAFT_SHARD").map { s =>
      val Array(i, m) = s.split("/").map(_.trim.toInt); (i, m)
    }
    val spark = Bench.session(cpus)
    // one full-size untimed warmup (inside minOfReps): JIT + codegen + page
    // cache settle only after a complete pass; then best-of-reps — the
    // sandbox is a shared VM (nonzero steal time), so the minimum is the
    // least-contended sample
    var processed = 0L
    val secs = {
      processed = Bench.rollupJob(spark, rows, shard) // warmup
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.rollupJob(spark, rows, shard)
        (System.nanoTime() - t0) / 1e9
      }
    }
    val sec = secs.min
    val shardJson = shard.map { case (i, m) => s""","shard":"$i/$m"""" }.getOrElse("")
    println(f"""{"cpus":$cpus,"points":$processed,"sec":$sec%.3f,"points_per_sec":${processed / sec}%.0f,"all_secs":${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}$shardJson}""")
    spark.stop()
  }
}
