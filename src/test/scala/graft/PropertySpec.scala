package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Morton, Sanitize}

/** Property-based invariants (SURVEY.md §5.2 item 2): the pure-Scala twins
  * of the engine's Column expressions, checked over generated inputs —
  * example-based specs pin the known cases, these pin the LAWS.
  *
  * scalacheck Gen is driven by a deterministic seed loop (the
  * scalatest-scalacheck bridge artifact is not in the offline cache, and
  * determinism beats shrinking here: a failure prints the exact input).
  */
class PropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no values")
  }

  // -- sketch-kernel tokenizer parity ------------------------------------

  test("byte-level tokenizer parity: kernel sketches == regex-split reference") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // the REFERENCE path the fast tokenizer replaced: UTF8String.trim then
    // regex split("\\s+", -1), voting/hashing identical to the kernels
    val ws = UTF8String.fromString("\\s+")
    def refTokens(str: String): Array[UTF8String] = {
      val t = UTF8String.fromString(str).trim()
      if (t.numBytes == 0) Array.empty[UTF8String] else t.split(ws, -1)
    }
    def refSimhash(str: String): Long = {
      val votes = new Array[Int](64)
      refTokens(str).foreach { tok =>
        val h = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, 42L)
        var j = 0
        while (j < 64) { votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      }
      var fp = 0L; var j = 0
      while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
      fp
    }
    // whitespace-heavy alphabet incl. every \s byte, multi-byte chars and
    // a lone surrogate (encodes as replacement-adjacent bytes)
    val alphabet = Gen.oneOf[Char](' ', '\t', '\n', 0x0B.toChar, '\f', '\r',
      'a', 'b', 'Z', '9', '\u00e9', '\u4e2d', '\ud83d'.toChar)
    val strGen = Gen.listOf(alphabet).map(_.mkString)
    forAllN(strGen, 500) { str =>
      val fast = graft.functions.SketchKernels.simhash64(UTF8String.fromString(str))
      assert(fast == refSimhash(str), s"simhash diverged on ${str.map(_.toInt).mkString(",")}")
      val fastSig = graft.functions.SketchKernels.minhashSig(UTF8String.fromString(str), 3, 8)
      // minhash reference: shingle over refTokens with concatWs, like the kernel
      val toks = refTokens(str)
      val mins = Array.fill(8)(Long.MaxValue)
      def add(parts: Array[UTF8String]): Unit = {
        val sh = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
        val base = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
        var i = 0
        while (i < 8) { val v = XXH64.hashInt(i, base); if (v < mins(i)) mins(i) = v; i += 1 }
      }
      if (toks.length <= 3) add(toks)
      else { var i = 0; while (i + 3 <= toks.length) { add(java.util.Arrays.copyOfRange(toks, i, i + 3)); i += 1 } }
      assert(fastSig.toSeq == mins.toSeq, s"minhash diverged on ${str.map(_.toInt).mkString(",")}")
    }
  }

  // -- sanitization -------------------------------------------------------

  test("sanitize is idempotent: sanitize(sanitize(x)) == sanitize(x)") {
    forAllN(Gen.asciiPrintableStr) { s =>
      val once = Sanitize.sanitizeCellScala(s)
      assert(Sanitize.sanitizeCellScala(once) == once, s"input: ${s.take(60)}")
    }
    // the escape prefix itself must be stable too
    for (p <- Seq("=", "+", "-", "@")) {
      val once = Sanitize.sanitizeCellScala(p + "payload")
      assert(once.startsWith("'") && Sanitize.sanitizeCellScala(once) == once)
    }
  }

  test("sanitize output never starts with a formula trigger") {
    forAllN(Gen.asciiPrintableStr) { s =>
      val out = Sanitize.sanitizeCellScala(s)
      assert(out.isEmpty || !Seq('=', '+', '-', '@').contains(out.head),
        s"input: ${s.take(60)} -> $out")
    }
  }

  // -- space-filling curves ------------------------------------------------

  private val coord = Gen.chooseNum(0, (1 << 16) - 1)

  test("morton interleave/deinterleave round-trip") {
    forAllN(Gen.zip(coord, coord)) { case (a, b) =>
      assert(Morton.deinterleave(Morton.interleave(a, b)) == ((a, b)))
    }
  }

  test("morton key is monotone along each axis (the pruning-locality law)") {
    forAllN(Gen.zip(coord, coord, coord)) { case (a1, a2, b) =>
      val (lo, hi) = (math.min(a1, a2), math.max(a1, a2))
      assert(Morton.interleave(lo, b) <= Morton.interleave(hi, b))
      assert(Morton.interleave(b, lo) <= Morton.interleave(b, hi))
    }
  }

  test("hilbert curve is a bijection on the grid (order 8)") {
    val c8 = Gen.chooseNum(0, 255)
    forAllN(Gen.zip(c8, c8)) { case (x, y) =>
      val d = Morton.hilbert(8, x, y)
      assert(d >= 0 && d < (1L << 16))
      assert(Morton.hilbertInverse(8, d) == ((x, y)), s"($x,$y) -> $d")
    }
  }

  test("hilbert adjacency: consecutive curve positions are grid neighbors") {
    // THE Hilbert property (Z lacks it): d and d+1 always map to cells at
    // Manhattan distance exactly 1 — no curve jumps anywhere
    forAllN(Gen.chooseNum(0L, (1L << 16) - 2)) { d =>
      val (x1, y1) = Morton.hilbertInverse(8, d)
      val (x2, y2) = Morton.hilbertInverse(8, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  // -- dedup groups vs a reference union-find ------------------------------

  test("dedupGroups equals connected components (reference union-find)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val genCase = for {
      n <- Gen.chooseNum(2, 24)
      nEdges <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(nEdges, Gen.zip(Gen.chooseNum(0, 23), Gen.chooseNum(0, 23)))
    } yield (n, edges.collect { case (a, b) if a != b && a < n && b < n =>
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.distinct)

    forAllN(genCase, n = 10) { case (n, edges) =>
      // reference: driver-side union-find with min-root merging
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap

      val ids = (0L until n.toLong).map(Tuple1(_)).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val r = graft.functions.Dedup.dedupGroupsResult(ids, "doc_id", pairs)
      assert(r.converged, "random small graphs must converge within the cap")
      val got = r.groups.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      r.groups.unpersist()
      assert(got == expected, s"n=$n edges=$edges")
    }
  }
}
