package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over tabular records — the
  * classic duplicate-customer problem, distinct from the text near-dup
  * family: candidate pairs come from BLOCKING (an equi-join on a cheap
  * deterministic key), expensive pairwise scoring (edit distance,
  * field agreement) runs only within blocks, and matches feed
  * survivorship (e.g. [[Dedup.clusters]] for transitive merge, min-id
  * survivor).
  *
  * Scale shape: the pair space is Σ|block|² instead of n² — the whole
  * art is the blocking key. The equi-join shuffles on it, so skew = a
  * hot block; the mitigations are the standard ones (compound keys to
  * shrink blocks, salting via [[SaltedJoin]], or a size cap per block
  * with overflow routed to a finer key — the same hot-bucket policy as
  * MinHash banding).
  */
object RecordLinkage {

  /** Within-block candidate pairs (a < b by id). Every non-block column
    * appears twice, prefixed `a_`/`b_`; block columns appear once.
    */
  def blockedPairs(df: DataFrame, idCol: String, blockCols: Seq[String]): DataFrame = {
    val aSide = df.select(df.columns.map(c =>
      if (blockCols.contains(c)) col(c) else col(c).as(s"a_$c")).toSeq: _*)
    val bSide = df.select(df.columns.map(c =>
      if (blockCols.contains(c)) col(c) else col(c).as(s"b_$c")).toSeq: _*)
    aSide.join(bSide, blockCols)
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
  }
}
