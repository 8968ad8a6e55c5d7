package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args(0) else "q14_merge_sum"
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Window ") || l.contains("Join"))
      .foreach(l => println("PLAN| " + l.trim.take(150)))
    spark.stop()
  }
}
