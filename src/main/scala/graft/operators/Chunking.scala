package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the context-preparation step of a
  * retrieval / training pipeline: each document's token stream is cut
  * into windows of `size` tokens starting every `stride` tokens
  * (overlap = size - stride), keeping the trailing partial window so no
  * suffix is lost. Complements [[SequencePacking]], which packs MANY
  * short documents into fixed windows; chunking splits ONE long
  * document into retrievable pieces with provenance offsets.
  *
  * Scale shape: entirely row-local — the chunk starts are a `sequence`
  * and each chunk a `slice` over the token array, one generator explode,
  * no shuffle anywhere. 100 TB of documents chunk at scan speed; the
  * output inherits the input's partitioning, ready for downstream
  * embedding or packing without a repartition.
  */
object Chunking {

  /** (doc_id, chunk_idx, start_tok, n_tokens, chunk_text) rows; documents
    * yielding no tokens produce no chunks. 1-based start_tok, 0-based
    * chunk_idx = start_tok div stride.
    */
  def tokenChunks(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val ts = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), ts.as("__ts"))
      .filter(size_(col("__ts")) > 0)
      .select(col("doc_id"), col("__ts"),
        explode(sequence(lit(1), size_(col("__ts")), lit(stride))).as("start_tok"))
      .select(
        col("doc_id"),
        ((col("start_tok") - 1) / stride).cast("int").as("chunk_idx"),
        col("start_tok").cast("int"),
        size_(slice(col("__ts"), col("start_tok"), lit(size))).as("n_tokens"),
        concat_ws(" ", slice(col("__ts"), col("start_tok"), lit(size))).as("chunk_text"))
  }

  // size() the function shadows size the parameter inside tokenChunks
  private def size_(c: org.apache.spark.sql.Column) = size(c)
}
