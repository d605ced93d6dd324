package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JetSql.translate

/** Differential fuzz for the Jet-SQL translator: random expression
  * trees render to Jet text (double-quoted strings with `""` escapes,
  * IIf/Nz/Switch/Choose, infix Mod, `&` concat, random whitespace),
  * translate to ANSI, EXECUTE in Spark — and must match an
  * independent in-test interpreter over the same tree. A structural
  * translator bug (dropped parens, wrong comma split, broken CASE
  * nesting, concat/Mod precedence) shows up as a value mismatch on
  * some seed; the seed is fixed so a failure reproduces exactly.
  *
  * Scope: literal-only expressions (no tables) in the two type lanes
  * Jet expressions mix — INTEGER arithmetic and STRING building.
  * NULL flows through Nz and out-of-range Choose. */
class JetSqlFuzzSpec extends AnyFunSuite {

  private sealed trait Expr
  private final case class IntLit(n: Int) extends Expr
  private final case class StrLit(s: String) extends Expr
  private case object NullLit extends Expr
  private final case class Add(a: Expr, b: Expr) extends Expr
  private final case class Mul(a: Expr, b: Expr) extends Expr
  private final case class Mod(a: Expr, b: Expr) extends Expr
  private final case class Concat(a: Expr, b: Expr) extends Expr
  private final case class Lt(a: Expr, b: Expr) extends Expr
  private final case class Iif(c: Expr, t: Expr, f: Expr) extends Expr
  private final case class Nz(a: Expr, b: Expr) extends Expr
  private final case class Switch(pairs: Seq[(Expr, Expr)]) extends Expr
  private final case class Choose(i: Expr, vs: Seq[Expr]) extends Expr

  // ----- generation (seeded, deterministic) -----
  private def genInt(r: scala.util.Random, depth: Int): Expr =
    if (depth <= 0) IntLit(r.nextInt(19) - 9)
    else r.nextInt(7) match {
      case 0 => IntLit(r.nextInt(19) - 9)
      case 1 => Add(genInt(r, depth - 1), genInt(r, depth - 1))
      case 2 => Mul(genInt(r, depth - 1), genInt(r, depth - 1))
      case 3 => // nonzero divisor literal keeps both engines defined
        Mod(genInt(r, depth - 1), IntLit(r.nextInt(8) + 2))
      case 4 => Iif(genBool(r, depth - 1),
        genInt(r, depth - 1), genInt(r, depth - 1))
      case 5 => Nz(if (r.nextBoolean()) NullLit else genInt(r, depth - 1),
        genInt(r, depth - 1))
      case 6 => Choose(IntLit(r.nextInt(4) + 1), // may run past the list
        Seq.fill(r.nextInt(3) + 1)(genInt(r, depth - 1)))
    }

  private def genBool(r: scala.util.Random, depth: Int): Expr =
    Lt(genInt(r, depth.min(1)), genInt(r, depth.min(1)))

  private def genStr(r: scala.util.Random, depth: Int): Expr = {
    def lit() = StrLit(Seq.fill(r.nextInt(3) + 1)(
      "ab\"x'y z"(r.nextInt(8))).mkString)
    if (depth <= 0) lit()
    else r.nextInt(4) match {
      case 0 => lit()
      case 1 => Concat(genStr(r, depth - 1), genStr(r, depth - 1))
      case 2 => Iif(genBool(r, depth - 1),
        genStr(r, depth - 1), genStr(r, depth - 1))
      case 3 => Switch(Seq.fill(r.nextInt(2) + 1)(
        (genBool(r, depth - 1), genStr(r, depth - 1))))
    }
  }

  // ----- render to Jet text -----
  private def ws(r: scala.util.Random): String =
    if (r.nextInt(4) == 0) "  " else " "
  private def jet(e: Expr, r: scala.util.Random): String = e match {
    case IntLit(n) => if (n < 0) s"($n)" else n.toString
    case StrLit(s) => "\"" + s.replace("\"", "\"\"") + "\""
    case NullLit => "Null"
    case Add(a, b) => s"(${jet(a, r)}${ws(r)}+${ws(r)}${jet(b, r)})"
    case Mul(a, b) => s"(${jet(a, r)}${ws(r)}*${ws(r)}${jet(b, r)})"
    case Mod(a, b) => s"(${jet(a, r)}${ws(r)}Mod${ws(r)}${jet(b, r)})"
    case Concat(a, b) => s"(${jet(a, r)}${ws(r)}&${ws(r)}${jet(b, r)})"
    case Lt(a, b) => s"(${jet(a, r)} < ${jet(b, r)})"
    case Iif(c, t, f) =>
      s"IIf(${jet(c, r)},${ws(r)}${jet(t, r)},${ws(r)}${jet(f, r)})"
    case Nz(a, b) => s"Nz(${jet(a, r)},${ws(r)}${jet(b, r)})"
    case Switch(ps) => "Switch(" + ps.map { case (c, v) =>
      s"${jet(c, r)},${ws(r)}${jet(v, r)}" }.mkString(", ") + ")"
    case Choose(i, vs) =>
      "Choose(" + (jet(i, r) +: vs.map(jet(_, r))).mkString(", ") + ")"
  }

  // ----- independent reference interpreter -----
  private def eval(e: Expr): Any = e match {
    case IntLit(n) => n
    case StrLit(s) => s
    case NullLit => null
    case Add(a, b) => nInt(eval(a), eval(b))(_ + _)
    case Mul(a, b) => nInt(eval(a), eval(b))(_ * _)
    case Mod(a, b) => nInt(eval(a), eval(b))(_ % _)
    case Concat(a, b) => (eval(a), eval(b)) match {
      case (null, _) | (_, null) => null // ANSI || propagates null
      case (x: String, y: String) => x + y
      case other => sys.error(s"type error $other")
    }
    case Lt(a, b) => nBool(eval(a), eval(b))(_ < _)
    case Iif(c, t, f) => eval(c) match {
      case java.lang.Boolean.TRUE => eval(t)
      case _ => eval(f) // null condition falls to ELSE, like CASE
    }
    case Nz(a, b) => eval(a) match { case null => eval(b); case v => v }
    case Switch(ps) => ps.collectFirst {
      case (c, v) if eval(c) == java.lang.Boolean.TRUE => eval(v)
    }.orNull
    case Choose(i, vs) => eval(i) match {
      case k: Int if k >= 1 && k <= vs.length => eval(vs(k - 1))
      case _ => null
    }
  }
  private def nInt(a: Any, b: Any)(f: (Int, Int) => Int): Any =
    (a, b) match {
      case (null, _) | (_, null) => null
      case (x: Int, y: Int) => f(x, y)
      case other => sys.error(s"type error $other")
    }
  private def nBool(a: Any, b: Any)(f: (Int, Int) => Boolean): Any =
    (a, b) match {
      case (null, _) | (_, null) => null
      case (x: Int, y: Int) => java.lang.Boolean.valueOf(f(x, y))
      case other => sys.error(s"type error $other")
    }

  private def norm(v: Any): Any = v match {
    case n: java.lang.Number => n.longValue
    case other => other
  }

  test("500 random expressions: Spark executing the translation " +
    "matches the independent interpreter (seeded)") {
    val spark = TestSpark.session
    val r = new scala.util.Random(20260815L)
    val exprs = (Seq.fill(250)(genInt(r, 3)) ++
      Seq.fill(250)(genStr(r, 3))).toVector
    // batch 25 expressions per SELECT so the fuzz stays fast
    exprs.grouped(25).zipWithIndex.foreach { case (batch, bi) =>
      val cols = batch.zipWithIndex.map { case (e, i) =>
        s"${jet(e, r)} AS c$i" }
      val row = spark.sql(translate("SELECT " + cols.mkString(", ")))
        .collect()(0)
      batch.zipWithIndex.foreach { case (e, i) =>
        val got = norm(row.get(i))
        val want = norm(eval(e))
        assert(got == want,
          s"batch $bi col $i: got $got want $want\n  jet: ${jet(e, r)}")
      }
    }
  }
}
