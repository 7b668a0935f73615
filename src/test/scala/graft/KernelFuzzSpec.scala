package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashKernels, TopKBuffer, TopKByScore}

/** Deterministic fuzz over the hand-written kernels — the code most
  * likely to harbor edge-case bugs (rolling windows, merge walks,
  * bounded heaps). Seeded, so failures reproduce.
  */
class KernelFuzzSpec extends AnyFunSuite {

  private def utf8(s: String) = UTF8String.fromString(s)

  test("jaccardSorted matches set arithmetic on 500 random sorted pairs") {
    val rnd = new scala.util.Random(1)
    (0 until 500).foreach { _ =>
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(60)).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(60)).distinct.sorted
      val got = HashKernels.jaccardSorted(
        new GenericArrayData(a), new GenericArrayData(b))
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val want = if (union == 0) 1.0 else inter.toDouble / union
      assert(got === want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("jaccardSortedL matches set arithmetic on 500 random sorted long pairs") {
    val rnd = new scala.util.Random(3)
    (0 until 500).foreach { _ =>
      // longs spanning negatives: the merge walk orders on signed values,
      // same as sort_array over the xxhash64 gram keys it verifies
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong - 30L).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong - 30L).distinct.sorted
      val got = HashKernels.jaccardSortedL(
        new GenericArrayData(a), new GenericArrayData(b))
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val want = if (union == 0) 1.0 else inter.toDouble / union
      assert(got === want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("shingleSet is sorted-distinct for arbitrary strings incl. unicode and short/empty") {
    val rnd = new scala.util.Random(2)
    val alphabets = Seq("ab", "abcde", "aéλ語 x", " ")
    (0 until 300).foreach { i =>
      val alpha = alphabets(i % alphabets.length)
      val s = Array.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length))).mkString
      val arr = HashKernels.shingleSet(utf8(s), 5)
      val ints = (0 until arr.numElements()).map(arr.getInt)
      assert(ints === ints.distinct.sorted, s"input='$s'")
      if (s.getBytes("UTF-8").isEmpty) assert(ints.isEmpty)
      else assert(ints.nonEmpty)
    }
  }

  test("simhash self-distance 0; minhash signatures equal for equal strings, length k") {
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val s = Array.fill(rnd.nextInt(50))(('a' + rnd.nextInt(26)).toChar).mkString
      assert(HashKernels.simHash(utf8(s), 3) === HashKernels.simHash(utf8(s), 3))
      val sig1 = HashKernels.minhashSig(utf8(s), 5, 32, 42L)
      val sig2 = HashKernels.minhashSig(utf8(s), 5, 32, 42L)
      assert(sig1.numElements() === 32)
      assert((0 until 32).forall(i => sig1.getLong(i) == sig2.getLong(i)))
    }
  }

  test("cosineF stays in [-1, 1] and is ~1 on positive-scaled copies") {
    val rnd = new scala.util.Random(4)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val v = Array.fill(n)(rnd.nextGaussian().toFloat)
      val w = Array.fill(n)(rnd.nextGaussian().toFloat)
      val va: ArrayData = new GenericArrayData(v)
      val wa: ArrayData = new GenericArrayData(w)
      val c = HashKernels.cosineF(va, wa)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      val scaled: ArrayData = new GenericArrayData(v.map(_ * 2.0f))
      if (v.exists(_ != 0.0f))
        assert(math.abs(HashKernels.cosineF(va, scaled) - 1.0) < 1e-9)
    }
  }

  test("TopKBuffer under random inserts, splits, serialization and merges == sort-take-k") {
    val rnd = new scala.util.Random(5)
    (0 until 200).foreach { trial =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // quantized scores force plenty of ties → tiebreak correctness
      val entries = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextLong() % 1000))
        .distinct
      val want = entries.sortBy { case (s, id) => (-s, id) }.take(k)

      val aggK = TopKByScore(null, null, k)
      val partitions = entries.groupBy(_ => rnd.nextInt(4)).values.toSeq
      val revived = partitions.map { p =>
        val b = new TopKBuffer(k)
        p.foreach { case (s, id) => b.insert(s, id) }
        aggK.deserialize(aggK.serialize(b)) // round-trip every buffer
      }
      val target = new TopKBuffer(k)
      rnd.shuffle(revived).foreach(b => b.foreachEntry((s, i) => target.insert(s, i)))
      val got = target.sorted.map(e => (e.score, e.id)).toSeq
      assert(got === want, s"trial=$trial k=$k entries=$entries")
    }
  }

  test("gramHashes64 char positions align with String windows on non-ASCII text") {
    // independent reference: per CHAR window, fold each char's UTF-8
    // bytes big-endian into a value, then the same polynomial+mix64 —
    // built from String/codePoint machinery the kernel never touches
    def charVals(str: String): Array[Long] =
      str.codePoints().toArray.map { cp =>
        new String(Character.toChars(cp)).getBytes("UTF-8")
          .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      }
    def refWindow(str: String, n: Int): Seq[Long] = {
      val cv = charVals(str)
      (0 to cv.length - n).map { i =>
        var h = 0L
        (i until i + n).foreach(j => h = h * 1000003L + cv(j))
        HashKernels.mix64(h)
      }
    }
    val rnd = new scala.util.Random(29)
    val alphabet = "aβc €好😀." // 1-, 2-, 3- and 4-byte chars
    val glyphs = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < alphabet.length) {
        val cp = alphabet.codePointAt(i)
        out += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      out.toSeq
    }
    (0 until 200).foreach { trial =>
      val n = 2 + rnd.nextInt(8)
      val s = Seq.fill(rnd.nextInt(40))(glyphs(rnd.nextInt(glyphs.size))).mkString
      val nChars = s.codePointCount(0, s.length)
      val got = HashKernels.gramHashes64(utf8(s), n).toLongArray().toSeq
      if (nChars < n)
        assert(got === Seq(HashKernels.mix64(HashKernels.rollingHash(utf8(s)))))
      else {
        assert(got.length === nChars - n + 1, s"trial=$trial n=$n s='$s'")
        assert(got === refWindow(s, n), s"trial=$trial n=$n s='$s'")
      }
    }
  }

  test("gramHashes64 == substring+rollingHash+mix64 reference, incl. short texts") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abc def."
    (0 until 300).foreach { trial =>
      val n = 2 + rnd.nextInt(14)
      val s = Array.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = HashKernels.gramHashes64(utf8(s), n).toLongArray().toSeq
      val want =
        if (s.length < n) Seq(HashKernels.mix64(HashKernels.rollingHash(utf8(s))))
        else (0 to s.length - n).map(i =>
          HashKernels.mix64(HashKernels.rollingHash(utf8(s.substring(i, i + n)))))
      assert(got === want, s"trial=$trial n=$n s='$s'")
    }
  }

  test("luhnCardCount matches a regex+BigInt reference on 500 random digit soups") {
    // reference: maximal digit runs via regex, Luhn via the textbook
    // reversed-digit fold — deliberately nothing like the kernel's
    // single-pass dual-parity accumulation
    def refLuhn(s: String): Int =
      "[0-9]+".r.findAllIn(s).count { r =>
        r.length >= 13 && r.length <= 19 && {
          val total = r.reverse.zipWithIndex.map { case (c, i) =>
            val d = c - '0'
            if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
          }.sum
          total % 10 == 0
        }
      }
    val rnd = new scala.util.Random(7)
    val alphabet = "0123456789 ab-."
    (0 until 500).foreach { trial =>
      val s = Array.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = HashKernels.luhnCardCount(utf8(s))
      assert(got === refLuhn(s), s"trial=$trial s='$s'")
    }
    // targeted shapes the random soup rarely hits
    Seq("1234567890123", "0" * 13, "0" * 19, "0" * 20, "9" * 13).foreach { s =>
      assert(HashKernels.luhnCardCount(utf8(s)) === refLuhn(s), s"s=$s")
    }
  }
}
