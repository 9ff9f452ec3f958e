package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Scratch profiler for the q34 bench investigation (round 3). Times
  * each stage of the minhash near-dup pipeline in isolation so the
  * recorded BENCH regression can be attributed, not guessed at.
  * Run: sbt "Test/runMain graft.tools.ProfileDedup"
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // job-level accounting: wall per job, summed task run time, #stages/#tasks
    case class JobStat(var wall: Double = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, (Long, Int)]() // id -> (start, nstages)
    val done = mutable.ArrayBuffer[(Int, Double, Int)]()
    val stages = mutable.ArrayBuffer[(Int, String, Double, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(j.jobId) = (System.nanoTime(), j.stageIds.size) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.remove(j.jobId).foreach { case (t0, n) =>
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, n))
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val wall = (for {a <- info.completionTime; b <- info.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val taskTime = info.taskMetrics.executorRunTime / 1e3
        stages.synchronized {
          stages += ((info.stageId, info.name.take(60), wall, taskTime, info.numTasks))
        }
      }
    })

    def time(name: String)(f: => DataFrame): Unit = {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      Dedup.releaseSketchCaches()
      Thread.sleep(200)
      val js = done.synchronized(done.toList)
      val jobSum = js.map(_._2).sum
      val compileMs = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000.0
      println(f"[profile] $name%-34s wall=$el%6.2f jobs=${js.size}%2d jobwall=$jobSum%6.2f stages=${js.map(_._3).sum}%3d cumCompile=${compileMs}%8.1f ms")
      val ss = stages.synchronized { val r = stages.toList; stages.clear(); r }
      ss.filter(s => s._3 > 0.4 || s._4 > 0.4).foreach { case (id, nm, w, tt, nt) =>
        println(f"[profile]    stage#$id%3d wall=$w%6.2f tasktime=$tt%7.2f ntasks=$nt%3d $nm")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("full_q34")(Dedup.minhashLsh(spark, sfDir))
      time("rep_candidates_only")(Dedup.minhashCandidates(docs))
      time("q34b_bucket_stats")(Dedup.lshBucketStats(spark, sfDir))
    }
    spark.stop()
  }
}
