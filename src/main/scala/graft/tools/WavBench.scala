package graft.tools
import java.util.concurrent.Executors
object WavBench {
  def main(args: Array[String]): Unit = {
    val base = ("the quick brown fox jumps over the lazy dog " * 20).getBytes("UTF-8")
    def work(n: Int): Unit = {
      var i = 0
      while (i < n) {
        val wav = graft.operators.Multimodal.encodeWav(base)
        val fp = graft.operators.Multimodal.audioFingerprint(wav)
        val sc = graft.operators.Multimodal.scaleWav(wav, 0.95)
        val fp2 = graft.operators.Multimodal.audioFingerprint(sc)
        if (fp == 42 && fp2 == 43) println("?")
        i += 1
      }
    }
    work(50)
    var t0 = System.nanoTime(); work(200)
    println(f"single-thread 200 docs: ${(System.nanoTime()-t0)/1e6}%.0f ms")
    val pool = Executors.newFixedThreadPool(32)
    val sampler = new Thread(() => {
      val tally = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      val states = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      (1 to 100).foreach { _ =>
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("pool-") && st.nonEmpty) {
            states(t.getState.toString) += 1
            val interesting = st.take(12).map(_.toString)
              .find(f => !f.startsWith("java.lang.Object.wait") && !f.startsWith("jdk.internal"))
              .getOrElse(st.head.toString)
            tally(st.take(6).map(s => s.getClassName + "." + s.getMethodName).mkString(" <- ")) += 1
          }
        }
        Thread.sleep(100)
      }
      println("== thread states: " + states.toSeq.sortBy(-_._2).mkString(", "))
      println("== top stacks:")
      tally.toSeq.sortBy(-_._2).take(8).foreach { case (s, n) => println(f"  $n%4d  $s") }
    })
    sampler.start()
    t0 = System.nanoTime()
    val futs = (1 to 32).map(_ => pool.submit(new Runnable { def run(): Unit = work(2000) }))
    futs.foreach(_.get())
    println(f"32 threads x 2000 docs: ${(System.nanoTime()-t0)/1e6}%.0f ms")
    pool.shutdown(); sampler.join()
  }
}
