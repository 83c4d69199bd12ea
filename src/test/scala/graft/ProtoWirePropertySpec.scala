package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
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

  test("salvageStatsStream: ANY truncation keeps exactly the complete-frame prefix") {
    // the q251 salvage kernel's whole contract, fuzzed: for an
    // arbitrary frame stream cut at an ARBITRARY byte position —
    // mid-varint, mid-body, or exactly on a boundary — the walk must
    // report precisely the frames wholly before the cut, a good-bytes
    // watermark equal to their span, and clean ⟺ the cut fell on a
    // frame boundary. QuarantineSpec pins crafted cases; this sweeps
    // the space (multi-byte varint prefixes, empty frames, 0-length
    // keys/columns that proto3 default-skipping produces).
    val genStream: Gen[List[(Array[Byte], List[(Array[Byte], Array[Byte], Long)])]] =
      Gen.chooseNum(0, 7).flatMap(n => Gen.listOfN(n, genRow))
    val gen = for {
      rows <- genStream
      frames = rows.map { case (k, cols) =>
        val ad = new GenericArrayData(cols.map { case (n, v, t) =>
          new GenericInternalRow(Array[Any](n, v, t))
        }.toArray[Any])
        ProtoWire.delimit(ProtoWire.encodeRow(k, ad))
      }
      total = frames.map(_.length).sum
      // half the cuts land exactly on boundaries (the frame-aligned
      // truncation a clean zstd EOF produces), half anywhere
      cut <- Gen.oneOf(
        Gen.oneOf(0 +: frames.scanLeft(0)(_ + _.length).drop(1)),
        Gen.chooseNum(0, total))
    } yield (rows, frames, cut)
    check(Prop.forAll(gen) { case (rows, frames, cut) =>
      val bytes = frames.flatMap(_.toSeq).toArray.take(cut)
      val (nr, nc, lastGood, clean) = ProtoWire.salvageStatsStream(
        new java.io.ByteArrayInputStream(bytes))
      val spans = frames.scanLeft(0)(_ + _.length)
      val keep = spans.tail.count(_ <= cut) // frames wholly before the cut
      (nr == keep.toLong) :| s"rows $nr != $keep" &&
        (nc == rows.take(keep).map(_._2.length).sum.toLong) :| "cols" &&
        (lastGood == spans(keep).toLong) :| s"watermark $lastGood != ${spans(keep)}" &&
        (clean == (spans(keep) == cut)) :| s"clean $clean at cut $cut"
    })
  }
}
