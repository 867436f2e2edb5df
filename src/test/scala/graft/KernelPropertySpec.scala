package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{BpeApplyMerges, SparseDot, WinnowKeys}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native Catalyst kernels, evaluated
  * directly through `Expression.eval` on `Literal` children — no Spark
  * session, so ScalaCheck can drive hundreds of generated cases per
  * property. Complements KernelLawsSpec's fixed-seed reference folds
  * with generator-diverse inputs and shrinking:
  *
  *   - the WINNOWING GUARANTEE (Schleimer et al. 2003, Thm. 2): two
  *     documents sharing any run of ≥ w+k−1 tokens share a selected
  *     fingerprint hash — the property every MOSS overlap/containment
  *     query rests on, stated independently of the implementation;
  *   - WinnowKeys ≡ a from-the-paper reference implementation;
  *   - BpeApplyMerges ≡ the naive per-merge left-to-right fold;
  *   - SparseDot ≡ the map-based dot product on sorted term vectors.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def checkProp(name: String, p: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(20260814L)),
      p)
    assert(res.passed, s"$name: $res")
  }

  private def strArray(xs: Seq[String]): Literal =
    Literal.create(xs, ArrayType(StringType))

  private def evalWinnow(tokens: Seq[String], k: Int, w: Int): Seq[String] =
    WinnowKeys(strArray(tokens), k, w).eval(null)
      .asInstanceOf[ArrayData].toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq

  private def md5Hex12(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(6)
      .map("%02x".format(_)).mkString

  /** Reference winnowing: fixed-width keys md5(gram)[1..12] ∥
    * lpad(32767−i, 5), leftmost min per window of w, first-selection
    * order, deduped. (Positions make keys unique, so leftmost-min and
    * the paper's rightmost-min pick the same KEY SET — the min is
    * unique per window.)
    */
  private def refWinnow(tokens: Seq[String], k: Int, w: Int): Seq[String] = {
    val n = tokens.length
    val m = math.min(n - k + 1, 32768)
    if (n < k || m < w) return Seq.empty
    val keys = (0 until m).map { i =>
      val ps = (32767 - i).toString
      md5Hex12(tokens.slice(i, i + k).mkString(" ")) +
        ("0" * (5 - ps.length)) + ps
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    for (s <- 0 to m - w) seen += keys.slice(s, s + w).min
    seen.toSeq
  }

  private val tokGen = Gen.oneOf("a", "b", "c", "d", "e", "tok", "x1")
  private val docGen = Gen.listOf(tokGen)

  test("winnowing guarantee: shared run of w+k-1 tokens => shared fingerprint hash") {
    val k = 3; val w = 4
    val shared = Gen.listOfN(w + k - 1, tokGen)
    val gen = for {
      s <- shared
      pa <- docGen; sa <- docGen
      pb <- docGen; sb <- docGen
    } yield (pa ++ s ++ sa, pb ++ s ++ sb)
    checkProp("guarantee", Prop.forAll(gen) { case (da, db) =>
      val ha = evalWinnow(da, k, w).map(_.take(12)).toSet
      val hb = evalWinnow(db, k, w).map(_.take(12)).toSet
      (ha intersect hb).nonEmpty
    })
  }

  test("WinnowKeys equals the reference implementation") {
    val gen = for {
      doc <- docGen
      k <- Gen.choose(1, 4)
      w <- Gen.choose(1, 6)
    } yield (doc, k, w)
    checkProp("reference", Prop.forAll(gen) { case (doc, k, w) =>
      evalWinnow(doc, k, w) == refWinnow(doc, k, w)
    })
  }

  test("BpeApplyMerges equals the naive per-merge fold") {
    def refBpe(tokens: Seq[String], merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(tokens) { case (cur, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < cur.length) {
          if (j + 1 < cur.length && cur(j) == a && cur(j + 1) == b) {
            out += (a + " " + b); j += 2
          } else { out += cur(j); j += 1 }
        }
        out.toSeq
      }
    val unit = Gen.oneOf("a", "b", "c", "a b", "b c", "a b c")
    val gen = for {
      doc <- docGen
      merges <- Gen.listOfN(4, Gen.zip(unit, unit))
    } yield (doc, merges)
    checkProp("bpe", Prop.forAll(gen) { case (doc, merges) =>
      BpeApplyMerges(strArray(doc), merges).eval(null)
        .asInstanceOf[ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
        .map(_.toString).toSeq == refBpe(doc, merges)
    })
  }

  test("SparseDot equals the map-based dot on sorted term vectors") {
    val termW = Gen.zip(Gen.oneOf((1 to 12).map("t" + _)), Gen.choose(-4.0, 4.0))
    val vecGen = Gen.listOf(termW).map(_.toMap.toSeq.sortBy(_._1))
    val gen = Gen.zip(vecGen, vecGen)
    checkProp("sparse_dot", Prop.forAll(gen) { case (va, vb) =>
      val e = SparseDot(
        strArray(va.map(_._1)),
        Literal.create(va.map(_._2), ArrayType(DoubleType)),
        strArray(vb.map(_._1)),
        Literal.create(vb.map(_._2), ArrayType(DoubleType)))
      val got = e.eval(null).asInstanceOf[Double]
      val mb = vb.toMap
      // reference accumulates in the same sorted-merge term order, so
      // the doubles agree exactly
      val want = va.collect { case (t, x) if mb.contains(t) => x * mb(t) }.sum
      got == want
    })
  }

  test("LowerBound equals the linear strictly-below count on sorted arrays") {
    val gen = Gen.zip(
      Gen.listOf(Gen.choose(-100.0, 100.0)).map(_.sorted),
      Gen.choose(-150.0, 150.0))
    checkProp("lower_bound", Prop.forAll(gen) { case (cuts, v) =>
      val e = org.apache.spark.sql.graft.LowerBound(
        Literal.create(cuts, ArrayType(DoubleType)),
        Literal.create(v, DoubleType))
      val got = e.eval(null).asInstanceOf[Long]
      got == cuts.count(_ < v).toLong
    })
  }

  test("LowerBound edges: empty array, all-below, all-above, exact-tie") {
    def lb(cuts: Seq[Double], v: Double): Long =
      org.apache.spark.sql.graft.LowerBound(
        Literal.create(cuts, ArrayType(DoubleType)),
        Literal.create(v, DoubleType)).eval(null).asInstanceOf[Long]
    assert(lb(Nil, 1.0) == 0L)
    assert(lb(Seq(1.0, 2.0, 3.0), 10.0) == 3L)
    assert(lb(Seq(1.0, 2.0, 3.0), 0.0) == 0L)
    // tie: a cut equal to the value is NOT below it (v > c is strict)
    assert(lb(Seq(1.0, 2.0, 2.0, 3.0), 2.0) == 1L)
  }
}
