package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ProtoWire

/** Property-based round trip: encode → frame → decode must be the
  * identity for arbitrary rows, including the edge cases proto3
  * default-skipping creates (empty keys/names/values, zero timestamps,
  * zero columns, >127-byte frames that need multi-byte varints).
  */
class ProtoWirePropertySpec extends AnyFunSuite {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))

  private val genCol: Gen[(Array[Byte], Array[Byte], Long)] = for {
    n <- genBytes; v <- genBytes
    t <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(0L, Long.MaxValue))
  } yield (n, v, t)

  private val genRow: Gen[(Array[Byte], List[(Array[Byte], Array[Byte], Long)])] =
    for {
      k <- genBytes
      cols <- Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, genCol))
    } yield (k, cols)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("decodeRows inverts encodeRow+delimit for arbitrary row streams") {
    check(Prop.forAll(Gen.listOfN(5, genRow)) { rows =>
      val stream = rows.flatMap { case (k, cols) =>
        val ad = new GenericArrayData(cols.map { case (n, v, t) =>
          new GenericInternalRow(Array[Any](n, v, t))
        }.toArray[Any])
        ProtoWire.delimit(ProtoWire.encodeRow(k, ad)).toSeq
      }.toArray
      val decoded = ProtoWire.decodeRows(stream).toList
      decoded.length == rows.length && decoded.zip(rows).forall {
        case (d, (k, cols)) =>
          d.key.sameElements(k) &&
            d.columns.length == cols.length &&
            d.columns.zip(cols).forall { case (dc, (n, v, t)) =>
              dc.name.sameElements(n) && dc.value.sameElements(v) &&
                dc.writeTime == t
            }
      }
    })
  }

  test("decodeStats agrees with decodeRows on arbitrary streams") {
    check(Prop.forAll(Gen.listOfN(6, genRow)) { rows =>
      val stream = rows.flatMap { case (k, cols) =>
        val ad = new GenericArrayData(cols.map { case (n, v, t) =>
          new GenericInternalRow(Array[Any](n, v, t))
        }.toArray[Any])
        ProtoWire.delimit(ProtoWire.encodeRow(k, ad)).toSeq
      }.toArray
      val (nr, nc) = ProtoWire.decodeStats(stream)
      nr == rows.length && nc == rows.map(_._2.length).sum
    })
  }
}
