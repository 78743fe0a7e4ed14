package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExpandStage, RemoteContextPool, SyntheticDocs}

/** One JVM = one parallelism level: `runMain graft.ScalingProbe <cpus> <docs>
  * <reps>` — warmup + reps timed runs, prints per-rep and best throughput.
  * Keeping each level in its own JVM removes cross-session GC/JIT pollution
  * from the N-vs-4N comparison.
  */
object ScalingProbe {
  def sampleStacks(frames: java.util.concurrent.ConcurrentHashMap[String, Integer]): Unit = {
    import scala.jdk.CollectionConverters._
    for ((t, st) <- Thread.getAllStackTraces.asScala if t.getName.startsWith("Executor task launch")) {
      if (st.nonEmpty) {
        val top = st.take(3).mkString(" <- ")
        frames.merge(top, 1, (a, b) => a + b)
      }
    }
  }

  def timed(spark: SparkSession, n: Long, parts: Int): (Double, Long) = {
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val docs = SyntheticDocs.generate(spark, n, parts)
    val t0 = System.nanoTime()
    val c = ExpandStage.triples(ExpandStage.run(docs, ctxB)).count()
    ((System.nanoTime() - t0) / 1e9, c)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 40000L
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = SparkSession.builder().master(s"local[$cpus]").appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val taskTimes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val deserTimes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTimes.add(te.taskInfo.duration)
        if (te.taskMetrics != null) deserTimes.add(te.taskMetrics.executorDeserializeTime)
      }
    })
    timed(s, n / 10, cpus) // warmup
    val times = (1 to reps).map { rep =>
      taskTimes.clear(); deserTimes.clear()
      val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val sampler = new Thread(() => {
        try { while (!Thread.interrupted()) { Thread.sleep(200); sampleStacks(frames) } }
        catch { case _: InterruptedException => }
      })
      sampler.setDaemon(true); sampler.start()
      val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val cpu0 = osBean.getProcessCpuTime
      val (t, c) = timed(s, n, cpus)
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      sampler.interrupt()
      println(f"[cpu] procCpu=$cpuSec%.1fs wall=$t%.3fs util=${cpuSec / t}%.1fx")
      if (t > 3.0) {
        import scala.jdk.CollectionConverters._
        frames.asScala.toVector.sortBy(-_._2).take(5).foreach { case (f, cnt) =>
          println(s"[stacks] $cnt x $f")
        }
      }
      import scala.jdk.CollectionConverters._
      val tt = taskTimes.asScala.toVector
      val dd = deserTimes.asScala.toVector
      println(f"[probe] rep=$rep cpus=$cpus docs=$n triples=$c sec=$t%.3f thr=${c / t}%.0f " +
        f"tasks=${tt.size} taskSum=${tt.sum / 1000.0}%.1fs taskMax=${tt.max / 1000.0}%.1fs deserSum=${dd.sum / 1000.0}%.1fs")
      t
    }
    println(f"[probe] BEST cpus=$cpus sec=${times.min}%.3f")
    s.stop()
  }
}
