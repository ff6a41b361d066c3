package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TopKAggregator: reduce/merge keep the k best with (score DESC, id ASC) ties") {
    val agg = new TopK.TopKAggregator(3)
    // interleave ties and out-of-order inserts
    val ins = Seq((5L, 9L), (7L, 2L), (5L, 1L), (7L, 8L), (3L, 0L), (9L, 4L))
    val buf = ins.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq((9L, 4L), (7L, 2L), (7L, 8L)))
    // merge of two independently-reduced halves == reduce of the whole
    val (h1, h2) = ins.splitAt(3)
    val merged = agg.merge(
      h1.foldLeft(agg.zero)(agg.reduce), h2.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == Seq((9L, 4L), (7L, 2L), (7L, 8L)))
  }

  test("TopK.perGroup == window row_number spelling on adversarial groups") {
    import spark.implicits._
    // groups smaller than k, exactly k, much larger than k; heavy ties
    val rows = for {
      g <- 0 until 7
      i <- 0 until (if (g == 0) 1 else if (g == 1) 4 else 40 * g)
    } yield (s"g$g", (i * 2654435761L) % 13, i.toLong) // scores collide hard
    val df = rows.toDF("source", "score", "doc_id").repartition(4)
    val got = TopK.perGroup(df, Seq("source"), $"score", $"doc_id", k = 4)
      .select($"source", $"rank", $"score", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"doc_id")
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 4)
      .select($"source", $"rank", $"score", $"doc_id".as("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("TopK.perGroup rejects fractional score/id columns loudly") {
    import spark.implicits._
    val df = Seq(("a", 1.5, 1L)).toDF("source", "score", "doc_id")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq("source"), $"score", $"doc_id", k = 2)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("TopK.perGroup plan partial-aggregates before the shuffle") {
    import spark.implicits._
    val df = tables.documents.select($"source", length($"text").as("score"), $"doc_id")
    val plan = TopK.perGroup(df, Seq("source"), $"score", $"doc_id", k = 5)
      .queryExecution.executedPlan.toString
    // typed Aggregator => ObjectHashAggregate with a partial_ mode map-side
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_"), plan.take(2000))
  }
}
