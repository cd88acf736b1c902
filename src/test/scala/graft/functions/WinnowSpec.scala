package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.SparkSpec

/** Winnowing guarantees (Schleimer et al. 2003) at the expression level. */
class WinnowSpec extends SparkSpec {

  private def fps(text: String, k: Int = 8, w: Int = 16): Seq[Long] = {
    val arr = Winnow(Literal(text), k, w).eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("density: at least one fingerprint per window, bounded above by grams") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val n = text.length - 8 + 1
    val f = fps(text)
    assert(f.nonEmpty)
    assert(f.size <= n)
    // a selected minimum survives at most w consecutive windows
    assert(f.size >= (n - 16 + 1) / 16, s"${f.size} fingerprints for $n grams")
  }

  test("copy detection: any shared substring of >= w + k - 1 bytes shares a fingerprint") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // substring of a, longer than w + k - 1 = 23 bytes, embedded elsewhere
    val stolen = a.substring(12, 50)
    val b = "XXXXXX " + stolen + " YYYYYY completely different tail content here"
    assert(fps(a).toSet.intersect(fps(b).toSet).nonEmpty)
    // unrelated texts of the same length share nothing
    val c = "0123456789".flatMap(ch => s"$ch$ch$ch") * 3
    assert(fps(a).toSet.intersect(fps(c).toSet).isEmpty)
  }

  test("short inputs: below k -> empty, between k and w+k-1 -> single fingerprint") {
    assert(fps("tiny").isEmpty) // < k bytes, no gram
    val mid = fps("exactly12chr") // 12 bytes -> 5 grams, all in one partial window
    assert(mid.size === 1)
  }

  test("deterministic and sensitive to single-byte edits") {
    val t = "some representative document body with enough length to fingerprint"
    assert(fps(t) === fps(t))
    val edited = t.replace("enough", "enouGh")
    assert(fps(t) !== fps(edited))
  }

  test("gate query emits one bounded count per document") {
    val out = graft.text.TextAnalysis.q_text_winnow.run(spark, sf()).collect()
    assert(out.length === 500)
    assert(out.forall(_.getAs[Int]("n_fingerprints") >= 0))
  }
}
