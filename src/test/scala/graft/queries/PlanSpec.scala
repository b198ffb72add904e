package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: these assertions pin the properties that
  * make the engine viable at 100 TB — column pruning reaching the parquet
  * scan, dimension joins broadcasting, codegen covering the hot path.
  * They are tests so a regression (e.g. a refactor that blocks pushdown)
  * fails CI, not a code review.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("derived-graph scan prunes lineitem to exactly the 3 id columns") {
    val plan = executedPlan(GraphQueries.edgesDf(spark, dir))
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.isDefined, s"no parquet ReadSchema in:\n$plan")
    val cols = readSchema.get.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_partkey", "l_suppkey", "l_linenumber"),
      s"scan reads $cols — pruning regressed")
  }

  test("filters on the pages table push down to the parquet scan") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en").select("doc_id", "n_chars")
    val plan = executedPlan(docs)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter not pushed:\n$plan")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).get.group(1)
    assert(!readSchema.contains("text"), "unused wide text column not pruned")
  }

  test("q_join_agg broadcasts the nation dimension") {
    val plan = executedPlan(RelationalQueries.joinAgg(spark, dir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation join did not broadcast:\n$plan")
  }

  test("text operators are expression-only (codegen span, no UDF hot path)") {
    val plan = executedPlan(TextQueries.quality(spark, dir))
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string;
    // the higher-order-function projection itself is interpreted by Spark
    // design (HOFs have no codegen), which still beats any UDF.
    assert(plan.contains("*("), s"no codegen stage at all:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into the text hot path:\n$plan")
  }

  test("adjacency build is one exchange + in-partition sort (no object agg)") {
    val g = graft.core.Graph.fromPairs(spark, graft.Fixtures.bucket9)
    val plan = g.adjacency.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"collect_list-style object aggregation crept back in:\n$plan")
  }
}
