package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-time attribution for one or more registered queries — the
  * guide-§1 "which stage is the time going to" step without a live UI (the
  * sandbox runs with spark.ui.enabled=false). Each Spark job triggered by
  * the query action is logged with its call site, so a multi-action operator
  * (StreamLink.processBatch, Pipeline.run) decomposes into its phases.
  *
  * `runMain graft.tools.QueryProbe <name>[,<name>...] [passes]`
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. Measurement
  * tooling only — never on any query path.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <query>[,<query>...] [passes]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.SparkSessionFactory.local(cpus, "graft-queryprobe")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, String, Long)]
    val starts = new scala.collection.mutable.HashMap[Int, (String, Long)]
    val execDesc = new scala.collection.mutable.HashMap[Long, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            synchronized { execDesc(s.executionId) = s.description.takeWhile(_ != '\n') }
          case _ =>
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => execDesc.get(id.toLong))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts(js.jobId) = (site, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(je.jobId).foreach { case (site, t0) =>
          jobs += ((je.jobId, site, je.time - t0))
        }
      }
    })

    for (n <- names; p <- 1 to passes) {
      synchronized { jobs.clear() }
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      val (snap, total) = synchronized { (jobs.sortBy(-_._3).toVector, jobs.map(_._3).sum) }
      println(f"== $n pass $p: wall=$wall%.2f s rows=$rows jobs=${snap.size} jobSum=${total / 1000.0}%.2f s")
      // per-site aggregation first (phases fire the same site repeatedly)
      snap.groupBy(_._2).map { case (site, js) => (site, js.map(_._3).sum, js.size) }
        .toSeq.sortBy(-_._2).take(25).foreach { case (site, ms, cnt) =>
          println(f"   $ms%7d ms  x$cnt%-3d $site")
        }
    }
    spark.stop()
  }
}
