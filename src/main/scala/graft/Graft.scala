package graft

import graft.harmonize._
import org.apache.spark.sql.DataFrame

/** Reference-shaped facade: the bdi-kit entry points (api.py) with
  * string method dispatch, over the distributed matchers. A user of
  * the reference can switch by renaming imports:
  *
  *   bdikit.match_schema(src, tgt, method="two_phase")
  *     -> Graft.matchSchema(src, tgt, method = "two_phase")
  */
object Graft {

  /** match_schema (api.py:43): 1:1 column mapping source -> target. */
  def matchSchema(source: DataFrame, target: DataFrame,
                  method: String = "similarity_flooding"): DataFrame = {
    val sCols = source.columns.toSeq
    val tCols = target.columns.toSeq
    method match {
      case "similarity_flooding" =>
        def meta(df: DataFrame) = df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
        SimilarityFlooding.matchColumns(source.sparkSession, meta(source), meta(target))
      case "distribution_based" | "jaccard_distance" =>
        SchemaMatcher.valueOverlapMatch(source, sCols, target, tCols)
      case "distribution_sketch" =>
        SchemaMatcher.valueOverlapSketchMatch(source, sCols, target, tCols)
      case "name_similarity" =>
        SchemaMatcher.nameSimilarityMatch(source.sparkSession, sCols, tCols)
      case "two_phase" =>
        SchemaMatcher.twoPhaseMatch(source, sCols, target, tCols)
      case "max_val_sim" =>
        SchemaMatcher.maxValSimMatch(source, sCols, target, tCols)
      case "coma" | "composite" =>
        SchemaMatcher.compositeMatch(source, sCols, target, tCols)
      case other => throw new IllegalArgumentException(
        s"unknown match_schema method: $other (supported: similarity_flooding, " +
          "distribution_based, jaccard_distance, distribution_sketch, " +
          "name_similarity, two_phase, max_val_sim, coma/composite)")
    }
  }

  /** top_matches (api.py:99): top-k target columns per source column. */
  def topMatches(source: DataFrame, target: DataFrame, topK: Int = 10): DataFrame =
    SchemaMatcher.valueOverlapTopK(source, source.columns.toSeq,
      target, target.columns.toSeq, topK)

  /** match_values (api.py:333): per mapped column pair, match distinct
    * source values to target values.
    */
  def matchValues(source: DataFrame, sourceColumn: String,
                  target: DataFrame, targetColumn: String,
                  method: String = "tfidf", threshold: Double = 0.3): DataFrame =
    method match {
      case "tfidf" =>
        ValueMatcher.tfidfMatch(source, sourceColumn, target, targetColumn, threshold)
      case "edit_distance" =>
        ValueMatcher.editDistanceMatch(source, sourceColumn, target, targetColumn, threshold)
      case "embeddings" =>
        ValueMatcher.profileEmbeddingMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold)
      case other => throw new IllegalArgumentException(
        s"unknown match_values method: $other (supported: tfidf, edit_distance, embeddings)")
    }

  /** top_value_matches (api.py:222): top-k target values per source value. */
  def topValueMatches(source: DataFrame, sourceColumn: String,
                      target: DataFrame, targetColumn: String,
                      topK: Int = 5, method: String = "tfidf",
                      threshold: Double = 0.3): DataFrame =
    method match {
      case "tfidf" =>
        ValueMatcher.tfidfMatch(source, sourceColumn, target, targetColumn, threshold, topK)
      case "edit_distance" =>
        ValueMatcher.editDistanceMatch(source, sourceColumn, target, targetColumn, threshold, topK)
      case "embeddings" =>
        ValueMatcher.profileEmbeddingMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold, topK = topK)
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }

  /** preview_domain (api.py:495): distinct values of a column. */
  def previewDomain(dataset: DataFrame, column: String, limit: Int = 0): DataFrame = {
    val dom = ValueMatcher.domain(dataset, column, "value_name").orderBy("value_name")
    if (limit > 0) dom.limit(limit) else dom
  }

  /** merge_mappings (api.py:561): user mappings take precedence. */
  def mergeMappings(mappings: Seq[ColumnMapping],
                    userMappings: Seq[ColumnMapping]): Seq[ColumnMapping] =
    Materialize.mergeMappings(mappings, userMappings)

  /** materialize_mapping (api.py:698): build the harmonized table. */
  def materializeMapping(table: DataFrame, spec: Seq[ColumnMapping]): DataFrame =
    Materialize(table, spec)
}
