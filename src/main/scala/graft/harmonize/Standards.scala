package graft.harmonize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** DataFrame-backed standard vocabulary, the equivalent of the
  * reference's named standards (e.g. its bundled GDC dictionary — the
  * full dictionary is reference data and not copied; [[Standards.builtinGdc]]
  * ships a public-knowledge GDC-FORMAT fixture, and any table of the
  * same shape plugs in). A standard is (attribute, value) rows: one
  * row per permitted value per standard attribute.
  *
  * Scale: vocabularies are small by definition (the reference's GDC
  * dictionary is ~1k attributes); matching broadcasts the vocabulary
  * side and distinct-reduces the data side, so cost tracks |distinct
  * source values|, never corpus rows.
  */
object Standards {

  /** Load a standard from a GDC-shaped schema JSON — the reference's
    * resource format (bdikit/standards/gdc.py:20-35): a top-level
    * object of `{attribute: {column_description, value_data: {value:
    * description}}}`. Dynamic keys rule out schema inference, so the
    * file is read wholetext and exploded through an explicit MapType —
    * vocabulary JSONs are megabytes, not terabytes; the resulting
    * DataFrame is what scales (broadcast into every match).
    */
  def fromSchemaJson(spark: org.apache.spark.sql.SparkSession,
                     path: String): Standards =
    fromJsonDf(spark.read.option("wholetext", "true").text(path))

  /** [[fromSchemaJson]] from an in-memory JSON string — the loader
    * behind classpath-resource vocabularies ([[builtinGdc]]).
    */
  def fromSchemaJsonString(spark: org.apache.spark.sql.SparkSession,
                           json: String): Standards = {
    import spark.implicits._
    fromJsonDf(Seq(json).toDF("value"))
  }

  /** The bundled GDC-FORMAT fixture vocabulary (a public-knowledge,
    * GDC-data-dictionary-shaped subset: demographic/diagnosis
    * categorical attributes with their standard permitted values,
    * plus free-text/numeric attributes with empty value_data). The
    * reference ships the full GDC vocabulary as resource data; this
    * fixture makes `match_schema(df, "gdc")` work out of the box with
    * the same loader, format, and dispatch path — swap in the real
    * dictionary with `Graft.registerStandard("gdc",
    * Standards.fromSchemaJson(spark, path))`.
    */
  def builtinGdc(spark: org.apache.spark.sql.SparkSession): Standards = {
    val in = getClass.getResourceAsStream("/graft/standards/gdc_fixture.json")
    require(in != null, "bundled gdc_fixture.json missing from classpath")
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    fromSchemaJsonString(spark, json)
  }

  private def fromJsonDf(raw: DataFrame): Standards = {
    import org.apache.spark.sql.types._
    val shape = MapType(StringType, StructType(Seq(
      StructField("column_description", StringType),
      StructField("value_data", MapType(StringType, StringType)))))
    val vocab = raw
      .select(F.explode(F.from_json(F.col("value"), shape))
        .as(Seq("attribute", "meta")))
      .select(F.col("attribute"),
        F.col("meta.column_description").as("attr_description"),
        F.explode_outer(F.col("meta.value_data"))
          .as(Seq("value", "value_description")))
    // explode_outer keeps attributes with EMPTY value_data as a
    // null-value row, so `attributes` still lists them (reference
    // get_columns does); the domain accessors filter nulls out
    Standards(vocab)
  }
}

final case class Standards(vocab: DataFrame,
                           attrCol: String = "attribute",
                           valueCol: String = "value") {
  require(vocab.columns.contains(attrCol) && vocab.columns.contains(valueCol),
    s"vocabulary must have columns $attrCol and $valueCol")

  /** Permitted values of one standard attribute. */
  def valueDomain(attribute: String): DataFrame =
    vocab.where(F.col(attrCol) === attribute && F.col(valueCol).isNotNull)
      .select(F.col(valueCol).as("value_name")).distinct()

  /** All attribute names in the standard. */
  def attributes: DataFrame =
    vocab.select(F.col(attrCol).as("attribute")).distinct()

  /** Match a source column's values against one standard attribute's
    * domain (reference: match_values(source, target="gdc", ...)).
    */
  def matchValues(source: DataFrame, sourceCol: String, attribute: String,
                  method: String = "tfidf", threshold: Double = 0.3): DataFrame =
    graft.Graft.matchValues(source, sourceCol,
      valueDomain(attribute), "value_name", method, threshold)

  /** Best-matching standard ATTRIBUTE per source column, by value
    * overlap of the source columns against each attribute's domain
    * (reference: match_schema(source, target="gdc")).
    */
  def matchSchema(source: DataFrame, sourceCols: Seq[String]): DataFrame = {
    val sv = sourceCols.map(c =>
        source.select(F.lit(c).as("source"), F.trim(F.col(c).cast("string")).as("value"))
          .where(F.col("value").isNotNull && F.col("value") =!= ""))
      .reduce(_ unionAll _).distinct()
    val tv = vocab.select(F.col(attrCol).as("target"),
        F.trim(F.col(valueCol).cast("string")).as("value"))
      .where(F.col("value").isNotNull && F.col("value") =!= "").distinct()
    val ns = sv.groupBy("source").agg(F.count(F.lit(1)).as("ns"))
    val nt = tv.groupBy("target").agg(F.count(F.lit(1)).as("nt"))
    val inter = sv.join(F.broadcast(tv), "value")
      .groupBy("source", "target").agg(F.count(F.lit(1)).as("ni"))
    val all = ns.crossJoin(F.broadcast(nt))
      .join(inter, Seq("source", "target"), "left")
      .na.fill(0L, Seq("ni"))
      .select(F.col("source"), F.col("target"),
        (F.col("ni").cast("double") /
          (F.col("ns") + F.col("nt") - F.col("ni")).cast("double")).as("similarity"))
    SchemaMatcher.bestPerSource(all)
  }
}
