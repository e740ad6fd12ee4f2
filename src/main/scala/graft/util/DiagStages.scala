package graft.util

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev diagnostic: per-stage wall/CPU breakdown of one or more declared
  * queries — the "which stage is slow and how many tasks did it get"
  * view the Spark UI would give, as text (the bench runs UI-off).
  *
  * Usage: runMain graft.util.DiagStages <queryName>... [-sf <dir>]
  * Env: SPARK_GRAFT_CPUS (default: host cores).
  *
  * Each query runs twice: the first run is warm-up (codegen + JIT), the
  * second is the measured one. Stages are listed in completion order
  * with task count, summed executor run/CPU time, and the dominant
  * RDD scope name — single-task stages with large run time are the
  * map-parallelism bottlenecks Parallelism.widen exists for.
  */
object DiagStages {

  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("-sf")
    val sfDir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val names = args.filterNot(Seq("-sf", sfDir).contains)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, tasks: Int, runMs: Long,
      cpuMs: Long, wallMs: Long, shufWriteB: Long, shufReadB: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n'),
            si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
            si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }

    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      // warm-up
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n===== $n  wall=$wall%.3f s =====")
      println(f"${"stage"}%-7s ${"tasks"}%5s ${"wall_ms"}%8s ${"run_ms"}%8s " +
        f"${"cpu_ms"}%8s ${"shW_KB"}%8s ${"shR_KB"}%8s  name")
      stages.synchronized {
        stages.sortBy(-_.runMs).take(30).foreach { s =>
          println(f"${s.id}%-7d ${s.tasks}%5d ${s.wallMs}%8d ${s.runMs}%8d " +
            f"${s.cpuMs}%8d ${s.shufWriteB / 1024}%8d " +
            f"${s.shufReadB / 1024}%8d  ${s.name.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
