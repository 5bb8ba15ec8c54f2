package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: per-query timing and plan inspection at
  * sf0.1. `runMain graft.Probe times q1 q2 ...` or
  * `runMain graft.Probe explain <query>`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    args.toList match {
      case "explain" :: q :: Nil =>
        SparkEntry.queries(q)(spark, d).explain("formatted")
      case "times" :: qs =>
        val targets = if (qs.nonEmpty) qs else SparkEntry.queries.keys.toList.sorted
        targets.foreach { q =>
          time(q) { SparkEntry.queries(q)(spark, d).count() }
          time(q + " (2nd)") { SparkEntry.queries(q)(spark, d).count() }
        }
      case _ =>
        println("usage: Probe times [queries...] | Probe explain <query>")
    }
    spark.stop()
  }
}
