package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** The SparkSessionExtensions hook and direct expression evaluation.
  * (The full `withExtensions` session path is exercised by
  * `graft.ExtCheck` — run standalone, since a shared test JVM can't build
  * a second differently-configured session.) */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers all native functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftExtensions().apply(ext) // must not throw
  }

  test("expressions evaluate standalone (no session)") {
    import graft.expressions._
    assert(CharHashExpr(Literal("ab")).eval(null) ===
      (97L * 31 + 98) % graft.functions.CrossFns.HashP)
    assert(CharHashExpr(Literal("")).eval(null) === 0L)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"), UTF8String.fromString("c")))
    val sh = ShingleHashesExpr(Literal.create(arr,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)), 3)
    val hs = sh.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(hs.numElements() === 1)
    // "a b c" hashed char by char
    val expected = "a b c".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(hs.getLong(0) === expected)
  }
}
