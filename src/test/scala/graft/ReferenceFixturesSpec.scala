package graft

import graft.harmonize._
import org.apache.spark.sql.{functions => F}

/** The reference's own test fixtures (reference tests/test_api.py,
  * test_value_matching.py, test_mapping_functions.py,
  * test_schema_matching.py), replayed against the graft facade — the
  * model-free cases must reproduce the reference's asserted outcomes.
  */
class ReferenceFixturesSpec extends SparkSpec {
  import spark.implicits._

  test("fixture: match_schema with dataframes (test_api.py:11)") {
    // similarity_flooding must map column_1 -> column_1a, col_2 -> col2
    val source = Seq(("a1", "a2"), ("b1", "b2"), ("c1", "c2"))
      .toDF("column_1", "col_2")
    val target = Seq(("a1", "a2"), ("b1", "b2"), ("c1", "c2"))
      .toDF("column_1a", "col2")
    val m = Graft.matchSchema(source, target, method = "similarity_flooding")
      .select("source", "target").as[(String, String)].collect().toMap
    assert(m("column_1") == "column_1a", s"got $m")
    assert(m("col_2") == "col2", s"got $m")
  }

  test("fixture: textual value matching (test_value_matching.py:9)") {
    // tfidf + the reference's ratio-scored edit matcher at threshold
    // 0.5: three fruits match their targets, dragon-fruits matches
    // nothing ("edit_distance_ratio" IS the reference scorer —
    // rapidfuzz fuzz.ratio; the plain "edit_distance" method keeps the
    // SQL-expressible levenshtein, which scores Red Apple/apple 0.44)
    val source = Seq("Red Apple", "Banana", "Oorange", "dragon-fruits").toDF("v")
    val target = Seq("apple", "banana", "orange", "kiwi").toDF("v")
    for (method <- Seq("tfidf", "edit_distance_ratio")) {
      val out = Graft.matchValues(source, "v", target, "v",
        method = method, threshold = 0.5)
        .as[(String, Option[String], Option[Double])].collect()
      val m = out.map(r => r._1 -> r._2).toMap
      assert(m("Red Apple").contains("apple"), s"$method: $m")
      assert(m("Banana").contains("banana"), s"$method: $m")
      assert(m("Oorange").contains("orange"), s"$method: $m")
      assert(m("dragon-fruits").isEmpty, s"$method: $m")
      // every reported similarity clears the threshold
      out.flatMap(_._3).foreach(s => assert(s >= 0.5, s"$method score $s"))
    }
  }

  test("fixture: numeric source columns skip value matching (api.py:488-493)") {
    // the reference's _skip_values: value matching is for
    // categorical/string domains — a numeric-dtype source column
    // yields NO matches (not stringified ones). skipNumericColumns
    // is the reference default on every path, including the
    // single-pair facade (r19); the explicit opt-out restores the
    // trimmed-stringified matching for callers who want it.
    val source = Seq(1.5, 2.5, 3.5).toDF("v")
    val target = Seq("1.5", "2.5", "9.9").toDF("v")
    val skipped = Graft.matchValues(source, "v", target, "v",
      method = "edit_distance", threshold = 0.3)
    assert(skipped.count() == 0)
    assert(skipped.columns.toSeq == Seq("source", "target", "similarity"))
    // integer dtypes skip too
    val intSrc = Seq(1L, 2L).toDF("v")
    assert(Graft.matchValues(intSrc, "v", target, "v",
      method = "tfidf", threshold = 0.1).count() == 0)
    // opt-out: stringified matching proceeds
    val forced = Graft.matchValues(source, "v", target, "v",
      method = "edit_distance", threshold = 0.9,
      skipNumericColumns = false)
      .as[(String, Option[String], Option[Double])].collect()
    assert(forced.map(r => r._1 -> r._2).toMap ==
      Map("1.5" -> Some("1.5"), "2.5" -> Some("2.5"), "3.5" -> None))
    // ...and the mapping overload keeps its established skip
    val tall = Graft.matchValuesMapping(source, target,
      Seq("v" -> "v"), method = "edit_distance", threshold = 0.3)
    assert(tall.count() == 0)
  }

  test("fixture: mapping functions (test_mapping_functions.py)") {
    val col = Seq("a", "b", "c", "d", "e").toDF("column_str")
    // identity
    assert(col.select(IdentityMapper.compile(F.col("column_str")))
      .as[String].collect().toSeq == Seq("a", "b", "c", "d", "e"))
    // dictionary
    assert(col.select(DictionaryMapper(Map("a" -> "1", "b" -> "2", "c" -> "3",
        "d" -> "4", "e" -> "5")).compile(F.col("column_str")))
      .as[String].collect().toSeq == Seq("1", "2", "3", "4", "5"))
    // dictionary with missing keys -> null (reference NaN default)...
    val withNulls = Seq(Some("a"), Some("b"), Some("e"), None).toDF("column_str")
    val dm = DictionaryMapper(Map("a" -> "1", "b" -> "2"))
    assert(withNulls.select(dm.compile(F.col("column_str")))
      .as[Option[String]].collect().toSeq ==
      Seq(Some("1"), Some("2"), None, None))
    // ...or the reference's missing_key_value override
    val dmDefault = DictionaryMapper(Map("a" -> "1"), missingValue = Some("<NA>"))
    assert(withNulls.select(dmDefault.compile(F.col("column_str")))
      .as[String].collect().toSeq == Seq("1", "<NA>", "<NA>", "<NA>"))
    // custom function (x -> x + x)
    assert(col.select(FunctionMapper(c => F.concat(c, c)).compile(F.col("column_str")))
      .as[String].collect().toSeq == Seq("aa", "bb", "cc", "dd", "ee"))
  }

  test("fixture: materialize_mapping column specs (test_api.py:168)") {
    val base = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("d", "d"), ("e", "e"))
      .toDF("column_str_1", "column_str_2")
    val out = Graft.materializeMapping(base, Seq(
      ColumnMapping("column_str_1", "string column 1", IdentityMapper),
      ColumnMapping("column_str_2", "string column 2", FunctionMapper(F.upper))))
    assert(out.columns.toSeq == Seq("string column 1", "string column 2"))
    assert(out.select(F.col("string column 1")).as[String].collect().sorted.toSeq
      == Seq("a", "b", "c", "d", "e"))
    assert(out.select(F.col("string column 2")).as[String].collect().sorted.toSeq
      == Seq("A", "B", "C", "D", "E"))
  }

  test("fixture: match_values over a mapping frame (test_api.py:200)") {
    // one result per mapped pair; one row per distinct source value
    val source = Seq("Red Apple", "Banana", "Oorange", "Strawberry").toDF("src_column")
    val target = Seq("apple", "banana", "orange", "kiwi", "grapes").toDF("tgt_column")
    val out = Graft.matchValuesMapping(source, target,
      Seq("src_column" -> "tgt_column"), method = "tfidf", threshold = 0.3)
    assert(out.select("source_column", "target_column").distinct()
      .as[(String, String)].collect().toSeq == Seq("src_column" -> "tgt_column"))
    assert(out.count() == 4, "one row per distinct source value, unmatched included")
  }

  test("fixture: end-to-end match -> plan -> materialize (test_api.py:224)") {
    val source = Seq("Red Apple", "Banana", "Oorange", "Strawberry").toDF("src_column")
    val target = Seq("apple", "banana", "orange", "kiwi", "grapes").toDF("tgt_column")
    val matches = Graft.matchValues(source, "src_column", target, "tgt_column",
      method = "tfidf", threshold = 0.3)
    val mapper = Graft.createMapper(matches)
    val out = Graft.materializeMapping(source,
      Seq(ColumnMapping("src_column", "tgt_column", mapper)))
    val vals = out.as[Option[String]].collect().flatten.toSet
    assert(Set("apple", "banana", "orange").subsetOf(vals), s"got $vals")
  }

  test("fixture: top_matches ranks the right targets (test_api.py:67 shape)") {
    // the reference fixture runs ct_learning (model-based, excluded);
    // the assertable outcome — tumor_size's top-3 candidates are the
    // three tumor_* columns, not color — must hold for the name matcher
    val source = Seq(("a1", 1)).toDF("tumor_size", "ignore").select("tumor_size")
    val target = Seq(("red", 12, 12, 12))
      .toDF("color", "tumor_length", "tumor_width", "tumor_size")
    val tm = Graft.topMatches(source, target, topK = 3, method = "name_similarity")
      .where(F.col("source") === "tumor_size")
      .select("target").as[String].collect().toSet
    assert(tm == Set("tumor_size", "tumor_length", "tumor_width"), s"got $tm")
  }

  test("fixture: preview_domain distinct values (test_api.py:397)") {
    val df = Seq("a", "b", "b", "c", null.asInstanceOf[String]).toDF("col")
    val dom = Graft.previewDomain(df, "col").select("value_name")
      .as[String].collect().toSeq
    assert(dom == Seq("a", "b", "c"), s"got $dom")
  }
}
