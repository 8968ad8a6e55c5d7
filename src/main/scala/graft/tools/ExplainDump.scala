package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of headline queries to files — the plan
  * evidence the optimization round commits under plans/r06/. Usage:
  *   runMain graft.tools.ExplainDump <outDir> <suffix> [q...]
  * e.g. runMain graft.tools.ExplainDump plans/r06 before q108_ewma
  * (no query args = every query in the battery). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)
    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      qs.get(name).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          val nEx = "Exchange".r.findAllIn(plan).length
          System.err.println(s"[explain] $name -> ${name}_$suffix.txt (Exchange x$nEx)")
        } catch {
          case e: Throwable => System.err.println(s"[explain] $name FAILED: $e")
        }
      }
    }
    spark.stop()
  }
}
