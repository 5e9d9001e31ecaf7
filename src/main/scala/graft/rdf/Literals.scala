package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed-literal dispatch (F6) — the reference's `_create_better_literal`
  * regex cascade (rdfify_improved.py:922-942), order-preserving: the gYear
  * branch fires before integer, so a 4-digit number is a gYear (bug-as-
  * feature, SURVEY.md §1.2). The custom TTL erases datatypes (only lexical
  * forms matter there); this column expression serves the queryable/typed
  * exports.
  */
object Literals {

  /** XSD datatype name for a string value, or "string". */
  def xsdTypeOf(v: Column): Column =
    when(v.rlike("^\\d{4}$"), "gYear")
      .when(v.rlike("^\\d{4}-\\d{2}-\\d{2}$"), "date")
      .when(v.rlike("^\\d+$"), "integer")
      .when(v.rlike("^\\d+\\.\\d+$"), "decimal")
      .when(lower(v).isin("true", "false"), "boolean")
      .otherwise("string")

  /** Plain-JVM twin of [[xsdTypeOf]] for per-row code paths. */
  def xsdTypeOf(v: String): String = {
    val s = v.trim
    if (s.matches("\\d{4}")) "gYear"
    else if (s.matches("\\d{4}-\\d{2}-\\d{2}")) "date"
    else if (s.matches("\\d+")) "integer"
    else if (s.matches("\\d+\\.\\d+")) "decimal"
    else if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) "boolean"
    else "string"
  }
}
