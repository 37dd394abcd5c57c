package graft

import org.scalacheck.Gen

/** Property-based proofs of the ALGEBRAIC identities the round-9
  * window rewrites stand on — checked on arbitrary generated inputs,
  * not just the corpus (the corpus-level specs in Round9OpsSpec pin
  * the operators; these pin the MATH the operators assume). Pure
  * driver-side arithmetic: no SparkSession needed. */
class Round9PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, s).foreach { a => body(a); produced += 1 }
      s = s.next
      attempts += 1
    }
    assert(produced == n, s"generator produced $produced/$n cases")
  }

  test("CUSUM closed form P_t - min(P) equals the max(0, S+(x-k)) recursion (300 series)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(-10L, 10L)
      xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield (k, xs)
    cases(gen, 300) { case (k, xs) =>
      // recursion
      var s = 0L
      val rec = xs.map { x => s = math.max(0L, s + (x - k)); s }
      // closed form: prefix sums minus running min (with the empty-
      // prefix 0 included — S_0 = 0 is a valid reset point)
      var p = 0L
      var minP = 0L
      val closed = xs.map { x =>
        p += x - k
        val v = p - math.min(minP, p)
        minP = math.min(minP, p)
        v
      }
      assert(closed == rec)
    }
  }

  test("weighted-median histogram rule: merging equal values never moves the answer (300 multisets)") {
    val gen = for {
      n <- Gen.choose(1, 40)
      vs <- Gen.listOfN(n, Gen.choose(0L, 15L)) // small domain forces ties
      ws <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield vs.zip(ws)
    cases(gen, 300) { rows =>
      val total = rows.map(_._2).sum
      // row-level rule (the first formulation)
      val sortedRows = rows.sortBy(_._1)
      var cum = 0L
      val rowLevel = sortedRows.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= total } => v
      }.get
      // histogram rule (the shipped formulation)
      val hist = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var cum2 = 0L
      val histLevel = hist.collectFirst {
        case (v, w) if { cum2 += w; 2 * cum2 >= total } => v
      }.get
      assert(histLevel == rowLevel)
    }
  }

  test("sign-bit Hamming: popcount over two 32-bit halves equals bitwise disagreement (300 vectors)") {
    val gen = for {
      a <- Gen.listOfN(64, Gen.oneOf(true, false))
      b <- Gen.listOfN(64, Gen.oneOf(true, false))
    } yield (a, b)
    def pack(bits: Seq[Boolean], lo: Int): Long =
      (0 until 32).map(i => if (bits(lo + i)) 1L << i else 0L).sum
    cases(gen, 300) { case (a, b) =>
      val packed = java.lang.Long.bitCount(pack(a, 0) ^ pack(b, 0)) +
        java.lang.Long.bitCount(pack(a, 32) ^ pack(b, 32))
      val direct = a.zip(b).count { case (x, y) => x != y }
      assert(packed == direct)
    }
  }

  test("KS integer form: max|c1*n2 - c2*n1|/(n1*n2) equals the float ECDF gap (200 sample pairs)") {
    val gen = for {
      n1 <- Gen.choose(1, 30)
      n2 <- Gen.choose(1, 30)
      xs <- Gen.listOfN(n1, Gen.choose(0L, 20L))
      ys <- Gen.listOfN(n2, Gen.choose(0L, 20L))
    } yield (xs, ys)
    cases(gen, 200) { case (xs, ys) =>
      val points = (xs ++ ys).distinct.sorted
      val (n1, n2) = (xs.length.toLong, ys.length.toLong)
      val intGap = points.map { v =>
        math.abs(xs.count(_ <= v) * n2 - ys.count(_ <= v) * n1)
      }.max
      val floatGap = points.map { v =>
        math.abs(xs.count(_ <= v).toDouble / n1 - ys.count(_ <= v).toDouble / n2)
      }.max
      // the integer form IS the float gap scaled by n1*n2 (exactly)
      assert(math.abs(intGap.toDouble / (n1 * n2) - floatGap) < 1e-12)
    }
  }
}
