package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The `injectParser` hook for the SQL DML surface: every statement
  * parses through the STOCK parser first (zero grammar forked — the
  * delegate owns the language), then [[GraftSqlDml.rewrite]] swaps
  * UPDATE / DELETE / MERGE plans whose target is a `graft-txn` table
  * for commands driving the transactional engines. Everything else —
  * including DML on non-graft tables — returns the delegate's plan
  * byte-for-byte, so installing the extension can never change the
  * semantics of a statement it does not own. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // maintenance statements (OPTIMIZE / VACUUM / DESCRIBE HISTORY) are
    // not in the stock grammar — the delegate would throw before any
    // plan rewrite could run, so they pre-match on the text; a target
    // that is not a graft-txn table falls through to the delegate
    GraftSqlDml.maintenance(session, sqlText).getOrElse {
      val plan = GraftSqlDml.rewriteTimeTravel(session, delegate.parsePlan(sqlText))
      GraftSqlDml.rewrite(session, plan).getOrElse(plan)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
