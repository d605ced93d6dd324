package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Access/Jet scalar idioms as first-class Column helpers
  * (SURVEY.md §2.2, §3.3): a user porting saved Access queries writes
  * the idiom they know and gets the ANSI/Catalyst translation the §2
  * inventory defines — `IIf→CASE WHEN`, `Nz→COALESCE`,
  * `Switch→chained CASE`, plus the Access LIKE wildcard dialect.
  * All pure Column composition: fully codegen'd and optimizer-visible.
  */
object JetFunctions {

  /** Access `IIf(cond, a, b)`. */
  def iif(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** Access `Nz(x)` / `Nz(x, default)` — null-to-value. */
  def nz(c: Column): Column = coalesce(c, lit(0))
  def nz(c: Column, default: Column): Column = coalesce(c, default)

  /** Access `Switch(c1, v1, c2, v2, ...)` — first true condition wins,
    * NULL when none match (Jet semantics). */
  def switchCase(pairs: (Column, Column)*): Column = {
    require(pairs.nonEmpty, "Switch needs at least one (cond, value)")
    pairs.tail.foldLeft(when(pairs.head._1, pairs.head._2)) {
      case (acc, (c, v)) => acc.when(c, v)
    }
  }

  /** Access LIKE dialect → SQL LIKE: `*`→`%`, `?`→`_`, `#`→digit
    * (via RLIKE for the digit class; pure `*`/`?` patterns stay LIKE).
    */
  def jetLike(c: Column, pattern: String): Column =
    if (pattern.contains('#')) {
      val rx = pattern.flatMap {
        case '*' => ".*"
        case '?' => "."
        case '#' => "[0-9]"
        case ch if "\\.[]{}()^$|+".contains(ch) => s"\\$ch"
        case ch => ch.toString
      }
      c.rlike(s"^$rx$$")
    } else
      c.like(pattern.map {
        case '*' => '%'
        case '?' => '_'
        case ch => ch
      }.mkString)
}
