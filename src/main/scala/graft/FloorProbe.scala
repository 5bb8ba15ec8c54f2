package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only microprobe for the per-query dispatch floor.
  *
  * ~70 of the 89 bench queries output presentation-sized results and run
  * 0.1–0.5s at sf0.1 while DuckDB runs them in 5–15 ms — the gap is NOT
  * the operators (the ≥1s-oracle queries run at 0.14–0.74× of DuckDB) but
  * a fixed per-query overhead. This probe decomposes that overhead:
  * relation construction (file listing + footer schema), planning,
  * AQE stage dispatch, and the noop-sink commit — so floor work targets
  * the measured component, not a guess.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[floor] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // 1. DataFrame construction alone (listing + schema inference).
    (1 to 3).foreach(i => time(s"read.parquet(lineitem) construct #$i") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
    })

    // 2. Same but through Tables.load (excludedRules conf churn included).
    (1 to 3).foreach(i => time(s"Tables.lineitem construct #$i") {
      graft.sources.Tables.lineitem(spark, sfDir)
    })

    // 3. Minimal action on a fresh vs a reused relation.
    (1 to 3).foreach(i => time(s"fresh-relation count #$i") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    })
    val reused = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (1 to 3).foreach(i => time(s"reused-relation count #$i") { reused.count() })

    // 4. Pure scheduling floor: zero-IO one-stage and two-stage jobs.
    (1 to 3).foreach(i => time(s"range noop (0 shuffle) #$i") {
      spark.range(1000).toDF("id").write.format("noop").mode("overwrite").save()
    })
    (1 to 3).foreach(i => time(s"range agg noop (1 shuffle) #$i") {
      spark.range(1000000).groupBy((col("id") % 5).as("k")).count()
        .write.format("noop").mode("overwrite").save()
    })

    // 5. A representative tiny query, steady-state.
    (1 to 4).foreach(i => time(s"q14_percentiles #$i") {
      SparkEntry.queries("q14_percentiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })
    (1 to 3).foreach(i => time(s"q17_salted_agg #$i") {
      SparkEntry.queries("q17_salted_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })

    // 6. Same tiny queries with AQE disabled (fewer replan/materialize
    // barriers on small inputs — measuring what AQE costs at this size).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 3).foreach(i => time(s"q14 AQE-off #$i") {
      SparkEntry.queries("q14_percentiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })
    (1 to 3).foreach(i => time(s"q17 AQE-off #$i") {
      SparkEntry.queries("q17_salted_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // 7. Shuffle-partition sensitivity at this scale.
    for (p <- Seq("32", "8")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      (1 to 2).foreach(i => time(s"q14 shufflePartitions=$p #$i") {
        SparkEntry.queries("q14_percentiles")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      })
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    spark.stop()
  }
}
