package graft.functions

import java.time.LocalDate
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType}

/** Eclipse date-literal parsing (`1 'JAN' 2000`, `01 JLY 1999`) as a native
  * Catalyst expression with codegen — the one scalar the builtin function
  * set can't express (SURVEY.md §2.11; reference common.py:96-111 month
  * map + 352-357 record parse). A native `UnaryExpression` with
  * `doGenCode` stays inside whole-stage codegen; a Scala UDF would break
  * the codegen span and pay serialization per row.
  */
object EclDate {

  private val Months = Map(
    "JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5, "JUN" -> 6,
    "JUL" -> 7, "JLY" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10,
    "NOV" -> 11, "DEC" -> 12)

  /** Parse to epoch days (DateType's internal form); null on malformed
    * input. Called from both interpreted eval and generated code.
    */
  def parseToDaysBoxed(s: String): Integer = {
    val toks = s.trim.split("\\s+")
    if (toks.length < 3) return null
    try {
      val day = toks(0).toInt
      val mon = Months.getOrElse(toks(1).replace("'", "").toUpperCase, -1)
      val year = toks(2).toInt
      if (mon < 0) null
      else Integer.valueOf(LocalDate.of(year, mon, day).toEpochDay.toInt)
    } catch { case _: RuntimeException => null }
  }

  /** Column-level entry point. */
  def ecl_date(c: Column): Column =
    GraftShims.column(EclDateParse(GraftShims.expression(c)))

  /** Register `ecl_date` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ecl_date", exprs => EclDateParse(exprs.head), "scala_udf")
}

case class EclDateParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DateType

  override def nullSafeEval(input: Any): Any =
    EclDate.parseToDaysBoxed(input.toString) match {
      case null => null
      case d => d.intValue()
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Integer ${ev.value}_d =
         |  graft.functions.EclDate.parseToDaysBoxed($c.toString());
         |if (${ev.value}_d == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_d.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EclDateParse =
    copy(child = newChild)
}
