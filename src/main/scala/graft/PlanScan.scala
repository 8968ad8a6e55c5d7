package graft
import org.apache.spark.sql.SparkSession
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bad = plan.linesIterator.filter(l => l.contains("Window ") && {
          // partitioned windows print "..., [partCols], [ordCols]"; global ones only "..., [ordCols]"
          val brackets = l.split("\\], \\[").length
          brackets < 3
        }).toList
        if (bad.nonEmpty) println(s"GLOBALWIN $name: ${bad.mkString(" || ").take(300)}")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(100)}") }
    }
    println("scan done")
    spark.stop()
  }
}
