package graft.harmonize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Value mappers + mapping materialization, re-expressing the
  * reference's harmonization plan execution (bdikit/api.py:698-737,
  * bdikit/mapping_functions.py:22-65) as a single distributed select —
  * every mapper compiles to a Catalyst expression, so materializing a
  * plan is one codegen'd projection with zero shuffles at any scale.
  */
sealed trait ValueMapper {
  /** Compile this mapper to a Column expression over the source column. */
  def compile(in: Column): Column
}

/** Copies values unchanged (mapping_functions.py:22 IdentityValueMapper). */
case object IdentityMapper extends ValueMapper {
  def compile(in: Column): Column = in
}

/** Maps via a dictionary; missing keys become `missingValue` — null by
  * default (reference default is NaN; mapping_functions.py:51
  * DictionaryMapper takes the same `missing_key_value` override).
  */
final case class DictionaryMapper(mapping: Map[String, String],
                                  missingValue: Option[String] = None)
    extends ValueMapper {
  def compile(in: Column): Column = {
    val m = F.map(mapping.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(F.lit(k), F.lit(v)) }: _*)
    val looked = F.element_at(m, in.cast("string"))
    missingValue.fold(looked)(d => F.coalesce(looked, F.lit(d)))
  }
}

/** Maps via an arbitrary Column->Column expression
  * (mapping_functions.py:34 FunctionValueMapper).
  */
final case class FunctionMapper(f: Column => Column) extends ValueMapper {
  def compile(in: Column): Column = f(in)
}

/** One output column of a harmonization plan (api.py:555 ColumnMappingSpec). */
final case class ColumnMapping(source: String, target: String,
                               mapper: ValueMapper = IdentityMapper)

object Materialize {

  /** Merge plans with user precedence and duplicate detection
    * (api.py:561 merge_mappings): user mappings win on (source,target)
    * key; duplicates within one list are an error.
    */
  def mergeMappings(auto: Seq[ColumnMapping],
                    user: Seq[ColumnMapping]): Seq[ColumnMapping] = {
    def checkDup(ms: Seq[ColumnMapping], what: String): Unit = {
      val dups = ms.groupBy(m => (m.source, m.target)).filter(_._2.size > 1).keys
      require(dups.isEmpty, s"Duplicate mapping in $what plan for: ${dups.mkString(", ")}")
    }
    checkDup(auto, "auto"); checkDup(user, "user")
    val userTargets = user.map(m => (m.source, m.target)).toSet
    user ++ auto.filterNot(m => userTargets.contains((m.source, m.target)))
  }

  /** create_mapper from value-match results (api.py:740-831 create_mapper,
    * api.py:834 _create_mapper_from_value_matches): the (source, target)
    * rows of a match_values output become a DictionaryMapper. Unmatched
    * source values (null target) are dropped — applying the mapper then
    * yields null for them, the reference's NaN semantics. Value-match
    * results are vocabulary-bounded by definition (value matching
    * operates on distinct domains), so collecting the dictionary is
    * driver-small; ambiguity resolves to the highest-similarity target
    * (ties to target ascending) when a similarity column is present.
    */
  def mapperFromMatches(matches: DataFrame): DictionaryMapper = {
    val hasSim = matches.columns.contains("similarity")
    val m = matches.where(F.col("target").isNotNull)
    val ordered =
      if (hasSim) m.orderBy(F.col("source"), F.col("similarity").desc, F.col("target").asc)
      else m.orderBy("source", "target")
    val dict = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ordered.select("source", "target").collect().foreach { r =>
      val s = r.getString(0)
      if (!dict.contains(s)) dict(s) = r.getString(1)
    }
    DictionaryMapper(dict.toMap)
  }

  /** Mapping-spec normalization (api.py:640 _normalize_mapping_spec):
    * a DataFrame with source/target columns — the match_schema output
    * shape — becomes an identity-mapped harmonization plan (the
    * reference creates an IdentityValueMapper when no mapper key is
    * given).
    */
  def specFromDataFrame(spec: DataFrame): Seq[ColumnMapping] = {
    require(Seq("source", "target").forall(spec.columns.contains),
      s"mapping spec needs source/target columns, has: ${spec.columns.mkString(", ")}")
    spec.select("source", "target").orderBy("source").collect().toSeq
      .map(r => ColumnMapping(r.getString(0), r.getString(1)))
  }

  /** Build the harmonized output table: one projected+mapped column per
    * spec entry (api.py:698 materialize_mapping).
    */
  def apply(input: DataFrame, spec: Seq[ColumnMapping]): DataFrame = {
    val missing = spec.map(_.source).filterNot(input.columns.contains)
    require(missing.isEmpty, s"Source columns not in input table: ${missing.mkString(", ")}")
    input.select(spec.map(m => m.mapper.compile(F.col(m.source)).as(m.target)): _*)
  }
}
