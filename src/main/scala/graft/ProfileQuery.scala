package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.mutable

/** Dev tool (guide §1: measure first): run named queries with the BENCH
  * session shape and print where the wall-clock goes — per-rep wall time,
  * the Spark jobs inside it (description, duration), and for streaming
  * queries every micro-batch's durationMs breakdown plus state-operator
  * commit times. Usage: runMain graft.ProfileQuery <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROFILE_REPS (default 2, first rep is warm-up at sf0.001). */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.sjoin.cellSize", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror Bench's tmpfs checkpoint rotation so streaming profiles
    // match what the bench measures
    val ckptRoot: Option[String] = {
      val shm = new java.io.File("/dev/shm")
      val root = if (shm.isDirectory && shm.canWrite) "/dev/shm" else null
      Option(root).map(_ + s"/graft_prof_${java.util.UUID.randomUUID().toString.take(8)}")
    }
    ckptRoot.foreach(r => Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
      catch { case _: java.io.IOException => () })))
    def rotateCkpt(): Unit = ckptRoot.foreach { r =>
      val next = s"$r/${java.util.UUID.randomUUID().toString.take(12)}"
      spark.conf.set("spark.sql.streaming.checkpointLocation", next)
    }

    // job-level accounting; label = job description if set, else the
    // first stage's call site (SQL actions rarely set a description)
    case class JobRec(id: Int, desc: String, tasks: Int, start: Long,
                      var end: Long = -1L)
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs += JobRec(j.jobId, d, j.stageInfos.map(_.numTasks).sum, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == j.jobId).foreach(_.end = j.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // streaming progress accounting
    val progress = mutable.ArrayBuffer.empty[String]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = progress.synchronized {
        val p = e.progress
        val so = p.stateOperators.map(s =>
          s"op=${s.operatorName} commitMs=${s.commitTimeMs} rows=${s.numRowsTotal} parts=${s.customMetrics}")
          .mkString(" | ")
        progress += s"batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs} $so"
      }
    })

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"\n################ $name ################")
      // warm-up at the smallest sibling sf (codegen/JIT), mirroring
      // Bench — derived from SPARK_GRAFT_SF_DIR's parent (a hardcoded
      // path silently skipped warm-up on other layouts and rep 1 then
      // measured cold codegen), overridable via SPARK_GRAFT_WARM_DIR;
      // a FAILED warm-up is loud for the same reason.
      val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
        new java.io.File(sfDir).getParent + "/sf0.001")
      rotateCkpt()
      try fn(spark, warmDir).count() catch { case t: Throwable =>
        println(s"*** WARM-UP FAILED (rep 1 will measure cold codegen): $t") }
      (1 to reps).foreach { rep =>
        jobs.synchronized(jobs.clear()); progress.synchronized(progress.clear())
        rotateCkpt()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat before reading
        Thread.sleep(300)
        println(f"\n--- rep $rep wall=$wall%.3f s rows=$n")
        val js = jobs.synchronized(jobs.toVector)
        val byDesc = js.groupBy(_.desc).map { case (d, v) =>
          (d, v.size, v.map(j => (j.end.max(j.start)) - j.start).sum,
            v.map(_.tasks).sum)
        }.toSeq.sortBy(-_._3)
        println(f"  jobs=${js.size} totalJobMs=${byDesc.map(_._3).sum}")
        byDesc.take(25).foreach { case (d, c, ms, tk) =>
          println(f"  $ms%6d ms  n=$c%-3d tasks=$tk%-5d ${d.take(100)}") }
        progress.synchronized(progress.toVector).foreach(p => println("  " + p))
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
