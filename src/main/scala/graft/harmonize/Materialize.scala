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

/** Maps via a dictionary; missing keys become null (reference uses NaN,
  * mapping_functions.py:51 DictionaryMapper).
  */
final case class DictionaryMapper(mapping: Map[String, String]) extends ValueMapper {
  def compile(in: Column): Column = {
    val m = F.map(mapping.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(F.lit(k), F.lit(v)) }: _*)
    F.element_at(m, in.cast("string"))
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

  /** Build the harmonized output table: one projected+mapped column per
    * spec entry (api.py:698 materialize_mapping).
    */
  def apply(input: DataFrame, spec: Seq[ColumnMapping]): DataFrame = {
    val missing = spec.map(_.source).filterNot(input.columns.contains)
    require(missing.isEmpty, s"Source columns not in input table: ${missing.mkString(", ")}")
    input.select(spec.map(m => m.mapper.compile(F.col(m.source)).as(m.target)): _*)
  }
}
