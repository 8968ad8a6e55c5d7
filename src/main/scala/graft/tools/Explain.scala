package graft.tools

/** Dev-only: print the formatted plan of a named driver query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q14_merge_sum")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Bench.session("8")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count() // let AQE finalize
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode))
    spark.stop()
  }
}
