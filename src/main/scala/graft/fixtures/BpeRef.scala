package graft.fixtures

import java.util.Locale

/** Independent sequential BPE (Sennrich et al., ACL 2016) — the oracle
  * side of q88 and the BpeSpec learner-parity gate. Deliberately a
  * different realization from [[graft.operators.Bpe]]: hash-map pair
  * counting over an in-memory word-frequency table (vs the distributed
  * flatMap+groupBy), and the same canonical contracts spelled
  * differently — training merges the argmax pair (count desc, pair
  * lexicographic) each round and applies it to every word; encoding
  * loops "merge the present pair with the lowest learned rank" until
  * none remains.
  */
object BpeRef {

  def tokenize(text: String): Array[String] =
    Option(text).getOrElse("")
      .toLowerCase(Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)

  /** Sequential learner over raw document texts. */
  def learnMerges(texts: Iterable[String], nMerges: Int): Seq[(String, String)] = {
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(t => tokenize(t).foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1))
    var words: Vector[(List[String], Long)] =
      freq.toVector.map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, n) = counts.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        if (n < 2) done = true
        else {
          merges += pair
          words = words.map { case (syms, c) => (merge(syms, pair), c) }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** Merge all non-overlapping occurrences, left to right (list walk). */
  private def merge(syms: List[String], pair: (String, String)): List[String] =
    syms match {
      case a :: b :: rest if a == pair._1 && b == pair._2 =>
        (a + b) :: merge(rest, pair)
      case a :: rest => a :: merge(rest, pair)
      case Nil => Nil
    }

  /** Priority-loop encode of one document: per word, repeatedly merge
    * the lowest-ranked present pair until none is learned. */
  def encode(text: String, merges: Seq[(String, String)]): Array[String] = {
    val rank = merges.zipWithIndex.toMap
    tokenize(text).flatMap { w =>
      var syms: List[String] = w.map(_.toString).toList
      var go = syms.lengthCompare(2) >= 0
      while (go) {
        val present = syms.zip(syms.drop(1)).filter(rank.contains)
        if (present.isEmpty) go = false
        else syms = merge(syms, present.minBy(rank))
      }
      syms
    }
  }
}
