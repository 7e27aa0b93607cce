package graft

/** Replays EVERY matcher name from the reference's three factory
  * registries against the facade, asserting each name either resolves
  * to a working matcher or raises the documented exclusion error
  * (UnsupportedOperationException, never an unknown-name error).
  *
  * Name lists are the reference enums verbatim:
  *  - value_matching/matcher_factory.py:7-21  (ValueMatchers)
  *  - schema_matching/one2one/matcher_factory.py:7-40 (SchemaMatchers)
  *  - schema_matching/topk/matcher_factory.py:7-11    (TopkMatchers)
  */
class ReferenceFactoryNamesSpec extends SparkSpec {
  import spark.implicits._

  // multi-char values: the tfidf matcher is char-3-gram based, so
  // single-letter domains would have no ngrams and no matches at all
  private def src = Seq(("alive", "x1"), ("deceased", "x2")).toDF("status", "code")
  private def tgt = Seq(("Alive", "y1"), ("Deceased", "y2")).toDF("status_code", "other")

  // the reference's documented model-free/model-backed split; the
  // model-backed names need an external model or network (SURVEY §6)
  private val valueResolves = Seq("tfidf", "edit_distance", "embedding", "fasttext")
  private val valueExcluded = Seq("gpt")
  private val schemaResolves = Seq("similarity_flooding", "coma", "cupid",
    "distribution_based", "jaccard_distance", "two_phase", "max_val_sim")
  private val schemaExcluded = Seq("gpt", "ct_learning")
  private val topkExcluded = Seq("ct_learning") // the topk factory's ONLY name

  test("every ValueMatchers factory name resolves or raises the documented exclusion") {
    valueResolves.foreach { m =>
      val out = Graft.matchValues(src, "status", tgt, "status_code",
        method = m, threshold = 0.0)
      assert(out.columns.toSeq == Seq("source", "target", "similarity"),
        s"value method $m")
      assert(out.count() > 0, s"value method $m returned no rows")
      val topk = Graft.topValueMatches(src, "status", tgt, "status_code",
        topK = 2, method = m, threshold = 0.0)
      assert(topk.count() > 0, s"top_value_matches method $m")
    }
    valueExcluded.foreach { m =>
      intercept[UnsupportedOperationException](
        Graft.matchValues(src, "status", tgt, "status_code", method = m))
      intercept[UnsupportedOperationException](
        Graft.topValueMatches(src, "status", tgt, "status_code", method = m))
    }
    // a typo'd name raises the unknown-name error, not a silent fallback
    intercept[IllegalArgumentException](
      Graft.matchValues(src, "status", tgt, "status_code", method = "embeding"))
  }

  test("every SchemaMatchers factory name resolves or raises the documented exclusion") {
    schemaResolves.foreach { m =>
      val out = Graft.matchSchema(src, tgt, method = m)
      assert(out.columns.contains("source") && out.count() > 0, s"schema method $m")
    }
    schemaExcluded.foreach { m =>
      intercept[UnsupportedOperationException](Graft.matchSchema(src, tgt, m))
    }
    intercept[IllegalArgumentException](Graft.matchSchema(src, tgt, "simflood"))
  }

  test("numeric source columns are skipped in multi-pair value matching") {
    // reference semantics (api.py:356-357 + _skip_values api.py:488-492):
    // a numeric source column contributes NO result frame
    val src = Seq(("alive", 34), ("deceased", 55)).toDF("status", "age")
    val tgt = Seq(("Alive", 30), ("Deceased", 50)).toDF("status_code", "age_years")
    val out = Graft.matchValuesMapping(src, tgt,
      Seq("status" -> "status_code", "age" -> "age_years"),
      method = "edit_distance", threshold = 0.0)
    val pairs = out.select("source_column").distinct()
      .as[String].collect().toSet
    assert(pairs == Set("status"), s"numeric 'age' pair must be skipped, got $pairs")
    // an all-numeric mapping yields an empty frame with the tall schema
    val empty = Graft.matchValuesMapping(src, tgt, Seq("age" -> "age_years"))
    assert(empty.columns.toSeq == Seq("source_column", "target_column",
      "source", "target", "similarity"))
    assert(empty.count() == 0)
  }

  test("TopkMatchers factory name raises the documented exclusion via topMatches") {
    topkExcluded.foreach { m =>
      intercept[UnsupportedOperationException](
        Graft.topMatches(src, tgt, topK = 2, method = m))
    }
    // and the all-pairs matchers the facade offers as topk methods work
    val out = Graft.topMatches(src, tgt, topK = 2, method = "name_similarity")
    assert(out.count() > 0)
  }
}
