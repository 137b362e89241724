package graft.queries

/** Shared DuckDB-SQL mirrors of TextFunctions primitives. Defined ONCE —
  * these strings must stay bit-identical to TextFunctions.normalize/tokens,
  * and a copy diverging in one query family would silently split the
  * oracle semantics. */
object OracleSql {
  /** mirror of TextFunctions.normalize */
  val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  /** mirror of TextFunctions.tokens */
  val toks = s"string_split($norm, ' ')"
}
