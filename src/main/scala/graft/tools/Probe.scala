package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke probe for the driver contract: entry() rows>0 on sf0.001. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println(s"[probe] entry schema: ${df.schema.fieldNames.mkString(",")}")
    println(s"[probe] entry rows: ${df.count()}")
    df.show(3)
    spark.stop()
  }
}
