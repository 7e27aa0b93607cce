package graft

import graft.harmonize.{ColumnMapping, DictionaryMapper}

class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq(("A", "x1"), ("R", "x2")).toDF("status", "code")
  private def tgt = Seq(("A", "y1"), ("R", "y2")).toDF("status_code", "other")

  test("facade dispatches every match_schema method") {
    val methods = Seq("similarity_flooding", "distribution_based",
      "distribution_sketch", "name_similarity", "two_phase", "max_val_sim", "coma")
    methods.foreach { m =>
      val out = Graft.matchSchema(src, tgt, method = m)
      assert(out.columns.contains("source") && out.count() > 0, s"method $m")
    }
    intercept[IllegalArgumentException](Graft.matchSchema(src, tgt, "nope"))
  }

  test("standards: DataFrame-backed vocabulary drives value and schema matching") {
    import graft.harmonize.Standards
    val vocab = Seq(
      ("primary_diagnosis", "Lung Adenocarcinoma"),
      ("primary_diagnosis", "Breast Carcinoma"),
      ("vital_status", "Alive"),
      ("vital_status", "Dead")).toDF("attribute", "value")
    val std = Standards(vocab)
    assert(std.attributes.count() == 2)
    assert(std.valueDomain("vital_status").as[String].collect().toSet == Set("Alive", "Dead"))

    val data = Seq(("lung adenocarcinoma", "Alive"), ("breast carcinoma", "Dead"))
      .toDF("diagnosis", "status")
    val vm = std.matchValues(data, "diagnosis", "primary_diagnosis",
      method = "edit_distance", threshold = 0.3)
      .as[(String, Option[String], Option[Double])].collect()
      .map { case (s, t, _) => s -> t }.toMap
    assert(vm("lung adenocarcinoma").contains("Lung Adenocarcinoma"))

    val sm = std.matchSchema(data, Seq("diagnosis", "status"))
      .as[(String, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(sm("status") == "vital_status", s"got $sm")
  }

  test("facade value matching, preview, and materialization round-trip") {
    val vm = Graft.matchValues(src, "status", tgt, "status_code", method = "edit_distance",
      threshold = 0.5)
    assert(vm.count() == 2)
    assert(Graft.previewDomain(src, "status").as[String].collect().toSeq == Seq("A", "R"))
    val plan = Graft.mergeMappings(
      Seq(ColumnMapping("status", "s", DictionaryMapper(Map("A" -> "auto")))),
      Seq(ColumnMapping("status", "s", DictionaryMapper(Map("A" -> "user")))))
    val out = Graft.materializeMapping(src, plan)
    assert(out.columns.toSeq == Seq("s"))
    assert(out.as[Option[String]].collect().toSet == Set(Some("user"), None))
  }
}
