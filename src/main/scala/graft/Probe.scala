package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema / plan probes at sf0.001. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, false)
    SparkEntry.entry(spark).show(5, false)
    spark.stop()
  }
}
