package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema / plan probes. */
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
    args.headOption.getOrElse("times") match {
      case "times" =>
        for (q <- Seq("etl_sse_parse")) {
          time(q) { SparkEntry.queries(q)(spark, d).count() }
          time(q + " (2nd)") { SparkEntry.queries(q)(spark, d).count() }
        }
      case "explain" =>
        SparkEntry.queries(args(1))(spark, d).explain("formatted")
      case "explodeplan" =>
        val ex3 = graft.operators.Dedup.shingledEx(spark, d)
        println("rows=" + ex3.count())
        println(ex3.queryExecution.executedPlan.toString)
      case "parts2" =>
        import org.apache.spark.sql.functions._
        val ex2 = graft.operators.Dedup.shingledEx(spark, d)
        time("new explode") { ex2.count() }
        time("new explode x2") { ex2.count() }
        val exh = ex2.select(col("doc_id"), xxhash64(col("s")).as("s"))
        val minCols2 = (0 until 128).map(i => min(hash(col("s"), lit(i))).as(s"h$i"))
        time("new 128 min aggs") { exh.groupBy(col("doc_id")).agg(minCols2.head, minCols2.tail: _*).count() }
        time("new 128 min aggs x2") { exh.groupBy(col("doc_id")).agg(minCols2.head, minCols2.tail: _*).count() }
        time("new self join") {
          ex2.hint("shuffle_hash").as("a").join(ex2.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
            .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
        }
        time("new self join x2") {
          ex2.hint("shuffle_hash").as("a").join(ex2.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
            .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
        }
      case "parts" =>
        import org.apache.spark.sql.functions._
        val docs = graft.sources.Tables.documents(spark, d)
        time("split only") {
          docs.select(split(col("text"), " ").as("toks")).select(size(col("toks"))).agg(sum("size(toks)")).count()
        }
        val sh = docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("sh", expr(graft.operators.TextAnalysis.shingleExpr))
        time("shingle arrays") { sh.select(size(col("sh")).as("n")).agg(sum("n")).count() }
        time("shingle arrays x2") { sh.select(size(col("sh")).as("n")).agg(sum("n")).count() }
        val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        time("explode count") { ex.count() }
        time("explode count x2") { ex.count() }
        time("explode toks") {
          docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t")).count()
        }
        val shPlain = docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("sh", expr(
            """transform(sequence(1, greatest(size(toks) - 2, 1)),
              | i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))""".stripMargin))
        time("explode no-distinct") {
          shPlain.select(col("doc_id"), explode(col("sh")).as("s")).count()
        }
        val shCached = sh.select(col("doc_id"), col("sh")).persist()
        time("explode cached arrays") {
          shCached.select(col("doc_id"), explode(col("sh")).as("s")).count()
        }
        time("explode cached arrays x2") {
          shCached.select(col("doc_id"), explode(col("sh")).as("s")).count()
        }
        val minCols = (0 until 128).map(i => min(hash(col("s"), lit(i))).as(s"h$i"))
        time("128 min aggs") { ex.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*).count() }
        time("self join pairs") {
          ex.hint("shuffle_hash").as("a").join(ex.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
            .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
        }
    }
    spark.stop()
  }
}
