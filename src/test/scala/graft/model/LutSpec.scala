package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Interpolated transcendental tables: accuracy and range-edge behavior
  * (float rounding at the bound once produced tbl(N) — keep it pinned). */
class LutSpec extends AnyFunSuite {

  test("LUT matches math.* within 1e-4 across the range") {
    var x = -7.99f
    while (x < 7.99f) {
      val g = (0.5 * x * (1.0 + math.tanh(0.7978845608028654 *
        (x + 0.044715 * x.toDouble * x * x)))).toFloat
      assert(math.abs(Kernel.Lut.gelu(x) - g) < 1e-4, s"gelu($x)")
      assert(math.abs(Kernel.Lut.tanh(x) - math.tanh(x)) < 1e-4, s"tanh($x)")
      x += 0.0137f
    }
    var y = -15.9f
    while (y < 0f) {
      assert(math.abs(Kernel.Lut.expNeg(y) - math.exp(y)) < 1e-4, s"exp($y)")
      y += 0.0137f
    }
  }

  test("range-edge floats do not overflow the table (rounding at the bound)") {
    // values whose (x - lo) rounds to the exact range width in Float
    val edges = Seq(-1e-8f, -1e-7f, -java.lang.Float.MIN_VALUE,
      7.9999995f, -7.9999995f)
    edges.foreach { x =>
      Kernel.Lut.gelu(x); Kernel.Lut.tanh(x) // must not throw
      if (x < 0) Kernel.Lut.expNeg(x)
    }
    assert(math.abs(Kernel.Lut.expNeg(-1e-8f) - 1f) < 1e-3)
    assert(math.abs(Kernel.Lut.tanh(7.9999995f) - 1f) < 1e-3)
    // outside-range behavior
    assert(Kernel.Lut.gelu(20f) === 20f)
    assert(Kernel.Lut.gelu(-20f) === 0f)
    assert(Kernel.Lut.expNeg(-20f) === 0f)
    assert(Kernel.Lut.tanh(42f) === 1f)
  }
}
