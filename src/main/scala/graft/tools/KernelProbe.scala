package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.encode.{CharVocab, Encoder}
import graft.model.{Gazetteer, Kernel, KernelConfig}
import graft.schema.Ontology

/** Plain-JVM thread-scaling probe for the inference kernel (no Spark):
  * isolates hardware/JVM scaling from Spark scheduling effects. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val kernel = new Kernel(KernelConfig(), CharVocab.size)
    val gaz = Gazetteer.fromLexicon()
    val text = "胸部CT检查所见：孤立性结节，左肺上叶，类圆形，约12×8mm，实性密度。余未见异常。"
    val question = Ontology.subject2question("Mass")

    def run(threads: Int, rowsPerThread: Int): Double = {
      val done = new AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = 0
          while (i < rowsPerThread) {
            val row = Encoder.encode(text, question, 168)
            val bias = gaz.subjectSpans(text, "Mass")
            val tags = kernel.tag(row, bias, 2)
            done.addAndGet(tags.length)
            i += 1
          }
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      threads * rowsPerThread / sec
    }

    run(4, 500) // warmup
    val r2 = run(2, 4000)
    val r8 = run(8, 4000)
    val r4 = run(4, 4000)
    val r16 = run(16, 4000)
    val r32 = run(32, 4000)
    println(f"rows/sec @2=$r2%.0f @4=$r4%.0f @8=$r8%.0f @16=$r16%.0f @32=$r32%.0f")
    println(f"eff 2->8=${(r8 / r2) / 4.0}%.3f 4->16=${(r16 / r4) / 4.0}%.3f 8->32=${(r32 / r8) / 4.0}%.3f")
  }
}
