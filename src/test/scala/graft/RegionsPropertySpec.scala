package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.core.Regions

/** Property-based checks for the multi-region core: the Matcher's
  * binary-search membership must equal the naive any-region scan on
  * arbitrary region soups (overlapping, nested, adjacent, open-ended),
  * and chunk coalescing must preserve coverage. These primitives
  * decide which records EVERY indexed multi-region query returns, so
  * they get the adversarial generator treatment, not just the curated
  * spec cases. */
class RegionsPropertySpec extends AnyFunSuite {

  /** scalatestplus bridge isn't on the classpath (offline build):
    * sample the generator with fixed seeds, same pattern as
    * WriterRoundTripSpec. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val chrGen = Gen.oneOf("1", "2", "X")
  private val regionGen: Gen[(String, Long, Long)] = for {
    chr <- chrGen
    lo <- Gen.chooseNum(1L, 1000L)
    openEnded <- Gen.prob(0.1) // 'chr:lo-' regions carry hi = Long.MaxValue
    span <- Gen.chooseNum(0L, 30L)
  } yield (chr, lo, if (openEnded) Long.MaxValue else lo + span)

  private def naiveContains(rs: Seq[(String, Long, Long)], chr: String, pos: Long): Boolean =
    rs.exists { case (c, lo, hi) => c == chr && pos >= math.max(lo, 1L) && pos <= hi }

  private def naiveOverlaps(rs: Seq[(String, Long, Long)], chr: String, s: Long, e: Long): Boolean =
    rs.exists { case (c, lo, hi) => c == chr && s <= hi && e >= math.max(lo, 1L) }

  test("Matcher == naive any-region scan for points and intervals") {
    samples(Gen.nonEmptyListOf(regionGen), 200).foreach { rs =>
      val m = Regions.matcher(rs)
      val probes = for (chr <- Seq("1", "2", "X", "nope"); p <- 1L to 1050L by 7) yield (chr, p)
      probes.foreach { case (chr, p) =>
        assert(m.containsPoint(chr, p) == naiveContains(rs, chr, p), s"point $chr:$p in $rs")
      }
      for (chr <- Seq("1", "2", "X"); s <- 1L to 1040L by 13) {
        val e = s + 9
        assert(m.overlaps(chr, s, e) == naiveOverlaps(rs, chr, s, e), s"ivl $chr:$s-$e in $rs")
      }
    }
  }

  test("mergeChunks preserves coverage and emits sorted disjoint-by-gap ranges") {
    val chunkGen = for {
      blk <- Gen.chooseNum(0L, 5000L)
      off <- Gen.chooseNum(0L, 65535L)
      len <- Gen.chooseNum(1L, 200000L)
    } yield { val b = (blk << 16) | off; (b, b + len) }
    samples(Gen.nonEmptyListOf(chunkGen), 200).foreach { chunks =>
      val merged = Regions.mergeChunks(chunks, coalesceBytes = 64)
      // sorted, and consecutive outputs separated by > coalesce gap
      merged.sliding(2).foreach {
        case Seq((b1, e1), (b2, _)) =>
          assert(b1 <= b2 && (b2 >>> 16) - (e1 >>> 16) > 64)
        case _ =>
      }
      // coverage: every input chunk lies inside some output chunk
      chunks.foreach { case (b, e) =>
        assert(merged.exists { case (mb, me) => mb <= b && e <= me },
          s"chunk ($b,$e) lost from $merged")
      }
    }
  }
}
