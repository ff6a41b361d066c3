package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * hot block; `blockCap` ENFORCES the hot-block policy (the same
  * policy as [[MinHashLSH.cappedBucketPairs]]): a block larger than
  * the cap never reaches the all-pairs self-join. Overflow blocks are
  * routed to the finer key `blockCols ++ finerKeyCols` when the caller
  * supplies one (the compound-key mitigation, exact within the finer
  * blocks), else to representative-star pairs (min-id rep × rest —
  * O(|block|) pairs that keep the block connected for transitive
  * clustering, at the cost of non-rep pair scores). Both routes are
  * logged, so a skewed key can't silently reintroduce n².
  */
object RecordLinkage {

  /** Above this, a block's |block|² pair quadratic is no longer "the
    * candidate set" but a reintroduced cross join; same order as
    * MinHashLSH.DefaultBucketCap.
    */
  val DefaultBlockCap = 4096

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Within-block candidate pairs (a < b by id). Every non-block column
    * appears twice, prefixed `a_`/`b_`; block columns appear once.
    * Blocks over `blockCap` records take the overflow route (see object
    * scaladoc) instead of the all-pairs join.
    */
  def blockedPairs(
      df: DataFrame, idCol: String, blockCols: Seq[String],
      blockCap: Int = DefaultBlockCap, finerKeyCols: Seq[String] = Nil,
      logOverflow: Boolean = true): DataFrame = {
    val w = Window.partitionBy(blockCols.map(col): _*)
    // cached: both branches filter it, and the overflow log statistic
    // reads it once more. Cache-release contract: see Dedup.jaccardPairs.
    val ann = df.withColumn("__cnt", count(lit(1)).over(w)).cache()
    val small = ann.filter(col("__cnt") <= blockCap).drop("__cnt")
    val overflow = ann.filter(col("__cnt") > blockCap).drop("__cnt")
    if (logOverflow) {
      val hot = overflow.select(blockCols.map(col): _*).distinct().count()
      if (hot > 0) {
        val route =
          if (finerKeyCols.nonEmpty) s"re-blocking on ${(blockCols ++ finerKeyCols).mkString("+")}"
          else "representative-star pairs"
        log.warn(s"blockedPairs: $hot hot block(s) exceed cap=$blockCap — routing to $route")
      }
    }
    val base = pairsWithin(small, idCol, blockCols)
    val extra =
      if (finerKeyCols.nonEmpty) {
        // exact pairs within the compound-key sub-blocks; finer-key
        // columns are equal across each pair, so re-emit them under both
        // prefixes to keep the output schema identical to the base branch
        val fine = pairsWithin(overflow, idCol, blockCols ++ finerKeyCols)
        finerKeyCols.filterNot(blockCols.contains).foldLeft(fine) { (d, c) =>
          d.withColumn(s"a_$c", col(c)).withColumn(s"b_$c", col(c)).drop(c)
        }
      } else {
        val rep = overflow.withColumn("__rep", min(col(idCol)).over(w))
        val aRep = rep.filter(col(idCol) === col("__rep")).drop("__rep")
          .select(rep.columns.filterNot(_ == "__rep").map(c =>
            if (blockCols.contains(c)) col(c) else col(c).as(s"a_$c")).toSeq: _*)
        val bRest = rep.filter(col(idCol) =!= col("__rep")).drop("__rep")
          .select(rep.columns.filterNot(_ == "__rep").map(c =>
            if (blockCols.contains(c)) col(c) else col(c).as(s"b_$c")).toSeq: _*)
        // one rep row per block, so this join fans out to |block|-1 pairs;
        // rep = min id keeps the a < b orientation for free
        aRep.join(bRest, blockCols)
      }
    base.unionByName(extra.select(base.columns.map(col).toSeq: _*))
  }

  private def pairsWithin(df: DataFrame, idCol: String, blockCols: Seq[String]): DataFrame = {
    val aSide = df.select(df.columns.map(c =>
      if (blockCols.contains(c)) col(c) else col(c).as(s"a_$c")).toSeq: _*)
    val bSide = df.select(df.columns.map(c =>
      if (blockCols.contains(c)) col(c) else col(c).as(s"b_$c")).toSeq: _*)
    aSide.join(bSide, blockCols)
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
  }
}
