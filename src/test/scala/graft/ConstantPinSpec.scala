package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MinHashSigAgg, Splitmix64}

/** Pins the sketch-kernel constants bit-for-bit. Every MinHash signature,
  * LSH band, and sign-projection bucket in the corpus derives from these
  * values — an accidental reseed (refactor, constant typo) would silently
  * re-bucket everything while every relative test stays green. These pins
  * turn that into a loud failure.
  */
class ConstantPinSpec extends AnyFunSuite {

  test("splitmix64 stream is the reference stream") {
    assert(Splitmix64(0L) === -2152535657050944081L)
    assert(Splitmix64(1L) === -7995527694508729151L)
    assert(Splitmix64(2L) === -7541218347953203506L)
  }

  test("MinHash permutation constants are pinned") {
    assert(MinHashSigAgg.const(0) === -4072116557966003400L)
    assert(MinHashSigAgg.const(1) === -1763377574458970542L)
    assert(MinHashSigAgg.const(2) === 5544209214934978506L)
  }

  test("sign-LSH plane coordinates are pinned") {
    // plane 0, coords 0..2 — via the public kernel on unit basis vectors:
    // dot(e_i, plane) = plane(i); sign bit of table-0 plane-0 flips at 0
    val e0 = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    val sig = graft.functions.SignLshSigExpr.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(e0), false, 1, 4)
    // plane(0,0)=0.419 ≥ 0, plane(1,0)? — bits of sig(0) encode the four
    // table-0 planes' signs at coordinate 0
    assert((sig.getLong(0) & 1L) === 1L) // plane 0 coord 0 = +0.419
  }

  test("rolling-hash kernel is pinned") {
    val h = graft.functions.RollingHashExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("graft"))
    assert(h === graft.functions.RollingHashExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("graft")))
    assert(h !== graft.functions.RollingHashExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("graf")))
  }
}
