package graft.text

/** Test-side reference encoders for the BPE kernel.
  *
  * [[encode]] is SEQUENTIAL TRAINER APPLICATION: for each merge in learned
  * order, replace every adjacent (a, b) left-to-right — the exact rule the
  * trainers themselves apply while learning (Bpe.learnMerges /
  * BpeTrain.learnMergesFast use it verbatim), and therefore the ground
  * truth the round-16 merge-priority kernel must match token for token.
  * Deliberately a different ALGORITHM than the kernel (the kernel replays
  * lowest-rank-first with packed-long rank lookups; this walks the whole
  * 8192-merge list with string symbols), so agreement is evidence, not
  * tautology. The `word.contains(a + b)` pre-filter is sound because the
  * symbols always concatenate back to the word — a pair can only be
  * adjacent if its concat is a substring.
  *
  * [[munchEncode]] is the RETIRED greedy longest-match (maximal munch)
  * encoder, kept as the divergence witness: BpeSpec pins a concrete input
  * where munch and the trainer's rule disagree and the kernel follows the
  * trainer.
  */
object BpeReference {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  def encode(word: String): Seq[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    var syms: Vector[String] = word.map(_.toString).toVector
    Bpe.merges.foreach { case (a, b) =>
      if (syms.length > 1 && word.contains(a + b)) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b)
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.result()
      }
    }
    memo.put(word, syms)
    syms
  }

  private lazy val byLen: Seq[(Int, Set[String])] =
    Bpe.piecesByLen.map { case (l, ps) => l -> ps.toSet }

  def munchEncode(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val piece = byLen
        .collectFirst {
          case (l, ps) if i + l <= word.length && ps(word.substring(i, i + l)) =>
            word.substring(i, i + l)
        }
        .getOrElse(word.substring(i, i + 1))
      out += piece
      i += piece.length
    }
    out.result()
  }
}
