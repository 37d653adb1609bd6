package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Translator for the Chroma-style metadata `where` filter DSL into a
  * Catalyst `Column` predicate (reference surface: the `where=` parameter at
  * /root/reference/src/PDFToChromaIngester.py:250-263 and
  * /root/reference/src/RagWorkflow.py:44-45).
  *
  * Supported forms (the full DSL Chroma documents; reference callers only
  * ever pass flat equality maps):
  *   {"k": v}                       -> col(k) === v
  *   {"k": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": v}}
  *   {"k": {"$in"|"$nin": [v...]}}
  *   {"$and"|"$or": [clause...]}
  *   multiple keys in one object    -> conjunction
  *
  * Emitting plain `Column` predicates means Catalyst pushes the filter into
  * the Parquet scan (row-group skipping) for free — the "filter before kNN"
  * ordering the reference delegates to Chroma.
  */
object WhereDsl {

  def parse(json: String): Column = toPredicate(JsonMethods.parse(json))

  private def litOf(v: JValue): Column = v match {
    case JString(s) => lit(s)
    case JInt(i) => lit(i.toLong)
    case JLong(l) => lit(l)
    case JDouble(d) => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JBool(b) => lit(b)
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private def toPredicate(j: JValue): Column = j match {
    case JObject(fields) =>
      fields.map {
        case ("$and", JArray(cs)) => cs.map(toPredicate).reduce(_ && _)
        case ("$or", JArray(cs)) => cs.map(toPredicate).reduce(_ || _)
        case (k, JObject(List((op, v)))) => opPredicate(col(k), op, v)
        case (k, v) => col(k) === litOf(v)
      }.reduce(_ && _)
    case other => throw new IllegalArgumentException(s"where clause must be an object, got $other")
  }

  /** Chroma's `where_document` content filter -> a predicate over the
    * given content column (the other half of the filter surface the
    * bound client API carries alongside `where`):
    *   {"$contains": "s"} | {"$not_contains": "s"}
    *   {"$and"|"$or": [clause...]}
    * `contains` is a plain substring test (Chroma semantics), emitted as
    * a Catalyst `Contains` — codegen'd, and eligible for the parquet
    * reader's string-contains row-group skipping. */
  def parseDocument(json: String, content: Column): Column =
    toDocPredicate(JsonMethods.parse(json), content)

  private def toDocPredicate(j: JValue, content: Column): Column = j match {
    case JObject(fields) =>
      // reduceOption: an empty object or empty $and/$or array gets the
      // DSL's IllegalArgumentException contract, not a bare empty.reduce
      def nonEmpty(cs: List[Column], what: String): List[Column] = {
        if (cs.isEmpty) throw new IllegalArgumentException(
          s"where_document $what must not be empty")
        cs
      }
      nonEmpty(fields.map {
        case ("$and", JArray(cs)) =>
          nonEmpty(cs.map(toDocPredicate(_, content)), "$and array").reduce(_ && _)
        case ("$or", JArray(cs)) =>
          nonEmpty(cs.map(toDocPredicate(_, content)), "$or array").reduce(_ || _)
        case ("$contains", JString(s)) => content.contains(lit(s))
        case ("$not_contains", JString(s)) => !content.contains(lit(s))
        case (op, _) => throw new IllegalArgumentException(
          s"unsupported where_document operator $op (expected $$contains/" +
            s"$$not_contains/$$and/$$or with string operands)")
      }, "clause").reduce(_ && _)
    case other => throw new IllegalArgumentException(
      s"where_document clause must be an object, got $other")
  }

  private def opPredicate(c: Column, op: String, v: JValue): Column = op match {
    case "$eq" => c === litOf(v)
    case "$ne" => c =!= litOf(v)
    case "$gt" => c > litOf(v)
    case "$gte" => c >= litOf(v)
    case "$lt" => c < litOf(v)
    case "$lte" => c <= litOf(v)
    case "$in" => v match {
      case JArray(vs) => c.isin(vs.map(x => litOf(x)): _*)
      case _ => throw new IllegalArgumentException("$in expects an array")
    }
    case "$nin" => v match {
      case JArray(vs) => !c.isin(vs.map(x => litOf(x)): _*)
      case _ => throw new IllegalArgumentException("$nin expects an array")
    }
    case other => throw new IllegalArgumentException(s"unsupported operator $other")
  }
}
