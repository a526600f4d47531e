package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** S8 checkpoint I/O: probe models persist and reload with identical
  * predictions (Spark ML native save/load — the reference never saves
  * models; the engine gets it for free and proves it). */
class MlPersistenceSpec extends SparkSpec {
  import spark.implicits._

  test("LogisticRegression probe save/load round-trip") {
    val e = Tables.embeddings(spark, sf).select(
      array_to_vector($"embedding".cast("array<double>")).as("features"),
      when($"label" < 5, 1.0).otherwise(0.0).as("y"))
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setMaxIter(10)
    val model = lr.fit(e)
    val dir = tmpDir("graft_model") + "/lr"
    model.write.overwrite().save(dir)
    val back = LogisticRegressionModel.load(dir)
    assert(back.coefficients == model.coefficients)
    val p1 = model.transform(e)
      .select(element_at(vector_to_array($"probability"), 2)).collect()
    val p2 = back.transform(e)
      .select(element_at(vector_to_array($"probability"), 2)).collect()
    p1.zip(p2).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0))
    }
  }
}
