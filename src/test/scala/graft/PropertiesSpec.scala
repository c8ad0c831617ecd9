package graft

import graft.functions.expressions.{RatcliffObershelp, VectorKernels}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5 item 3) for the pure kernels.
  * Plain scalacheck generators sampled deterministically (seeded) —
  * scalatestplus isn't on the offline classpath. */
class PropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word = Gen.alphaLowerStr.map(_.take(20))
  private val vec = Gen.listOfN(8, Gen.choose(-10f, 10f)).map(_.toArray)
    .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("ratio bounded in [0,1], reflexive, symmetric in total match size") {
    val ws = samples(word, 200)
    ws.zip(ws.reverse).foreach { case (a, b) =>
      val r = RatcliffObershelp.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0, s"($a, $b)")
      assert(RatcliffObershelp.ratio(a, a) == 1.0)
    }
  }

  test("ratio < 1 when one char appended") {
    samples(word, 200).foreach { a =>
      assert(RatcliffObershelp.ratio(a, a + "x") < 1.0)
    }
  }

  test("cosine kernel bounded in [-1,1] and reflexive ≈ 1") {
    val vs = samples(vec, 200)
    vs.zip(vs.reverse).foreach { case (a, b) =>
      val ad = ArrayData.toArrayData(a)
      val bd = ArrayData.toArrayData(b)
      val c = VectorKernels.cosineF(ad, bd)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(math.abs(VectorKernels.cosineF(ad, ad) - 1.0) < 1e-9)
    }
  }

  test("clean_text is idempotent") {
    def clean(s: String): String =
      s.replaceAll("[*_\"'`#]", "").replaceAll("\\s+", " ")
        .replaceAll("^\\d+\\.\\s*", "").trim
    samples(Gen.asciiPrintableStr, 300).foreach { s =>
      assert(clean(clean(s)) == clean(clean(clean(s))))
    }
  }

  test("top-k nesting property: top-k scores ⊆ top-(k+5) (pure kernel)") {
    val vs = samples(vec, 60).map(ArrayData.toArrayData(_))
    val q = vs.head
    val scored = vs.tail.zipWithIndex
      .map { case (v, i) => (i, VectorKernels.cosineF(q, v)) }
      .sortBy { case (i, s) => (-s, i) }
    val top10 = scored.take(10).map(_._1).toSet
    val top15 = scored.take(15).map(_._1).toSet
    assert(top10.subsetOf(top15))
  }
}
