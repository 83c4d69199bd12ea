package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CdcChunks60Expr, DotLongExpr, GramHash60Expr, Md5Prefix60Expr, ProtoEncodeRowExpr, ShingleHash60Expr, SortedIntersectCountExpr, VarintDelimitExpr}

/** SparkSessionExtensions installer exposing the engine's native
  * expressions to SQL users:
  *
  * {{{
  * spark-shell --conf spark.sql.extensions=graft.GraftExtensions
  * SELECT proto_delimited(proto_row(key, columns)) FROM ...
  * }}}
  *
  * The registered functions are the custom codegen'd Catalyst
  * expressions (not UDFs), so SQL callers get the same whole-stage
  * codegen path as the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("proto_row"),
      info("proto_row", classOf[ProtoEncodeRowExpr]),
      (es: Seq[Expression]) => ProtoEncodeRowExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("proto_delimited"),
      info("proto_delimited", classOf[VarintDelimitExpr]),
      (es: Seq[Expression]) => VarintDelimitExpr(es(0))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", classOf[SortedIntersectCountExpr]),
      (es: Seq[Expression]) => SortedIntersectCountExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_long"),
      info("dot_long", classOf[DotLongExpr]),
      (es: Seq[Expression]) => DotLongExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60", classOf[Md5Prefix60Expr]),
      (es: Seq[Expression]) => Md5Prefix60Expr(es(0))))
    // n/k must be integer literals (evaluated at registration)
    ext.injectFunction((FunctionIdentifier("gram_hash60"),
      info("gram_hash60", classOf[GramHash60Expr]),
      (es: Seq[Expression]) =>
        GramHash60Expr(es(0), es(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60", classOf[ShingleHash60Expr]),
      (es: Seq[Expression]) =>
        ShingleHash60Expr(es(0), es(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((FunctionIdentifier("cdc_chunks60"),
      info("cdc_chunks60", classOf[CdcChunks60Expr]),
      (es: Seq[Expression]) =>
        CdcChunks60Expr(es(0), es(1).eval().asInstanceOf[Number].intValue)))
  }
}
