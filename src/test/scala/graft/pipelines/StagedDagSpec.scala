package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StagedDagSpec extends SparkSpec {
  import spark.implicits._

  test("stage chain derives tables in order; resume processes only pending") {
    val input = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val stages = Seq(
      StagedDag.Stage("s1", Seq("id"), df => df.withColumn("u", upper(col("v")))),
      StagedDag.Stage("s2", Seq("id"), df => df.withColumn("n", length(col("u")))))

    val cold = StagedDag.run(input, stages)
    assert(cold("s1").columns.toSeq == Seq("id", "v", "u"))
    assert(cold("s2").columns.toSeq == Seq("id", "v", "u", "n"))
    assert(cold("s2").count() == 3)

    // Resume: s1 already holds ids 1,2 with a marker value — only id 3 is
    // re-derived; existing rows pass through untouched.
    val existingS1 = Seq((1, "a", "KEPT"), (2, "b", "KEPT"))
      .toDF("id", "v", "u")
    val resumed = StagedDag.run(input, stages,
      existingFor = { case "s1" => Some(existingS1); case _ => None })
    val s1 = resumed("s1").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(2))).toSeq
    assert(s1 == Seq((1, "KEPT"), (2, "KEPT"), (3, "C")))
  }
}
