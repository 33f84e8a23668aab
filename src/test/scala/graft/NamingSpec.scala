package graft

import graft.core.Naming
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's naming/versioning contract
  * (tests/test_metEAUdata.py:252-321; types.py:608-676). */
class NamingSpec extends AnyFunSuite {

  test("splitKey splits on the single underscore") {
    assert(Naming.splitKey("CODs#1_RAW#1") == ("CODs#1", "RAW#1"))
    assert(Naming.splitKey("A#1_LIN-INT#2") == ("A#1", "LIN-INT#2"))
    intercept[IllegalArgumentException](Naming.splitKey("no-underscore"))
    intercept[IllegalArgumentException](Naming.splitKey("a_b_c"))
  }

  test("baseAndVersion parses #N counters") {
    assert(Naming.baseAndVersion("RAW#3") == ("RAW", Some(3)))
    assert(Naming.baseAndVersion("RAW") == ("RAW", None))
    assert(Naming.baseAndVersion("LIN-INT#12") == ("LIN-INT", Some(12)))
    // non-numeric tail is part of the name
    assert(Naming.baseAndVersion("X#y") == ("X#y", None))
  }

  test("unnumbered parts are normalized to #1, numbered preserved") {
    assert(Naming.ensureNumbered("RAW") == "RAW#1")
    assert(Naming.ensureNumbered("RAW#2") == "RAW#2")
  }

  test("nextVersioned assigns max+1 within the same base") {
    assert(Naming.nextVersioned(Nil, "RESAMPLED") == "RESAMPLED#1")
    assert(Naming.nextVersioned(Seq("RAW#1"), "RESAMPLED") == "RESAMPLED#1")
    assert(Naming.nextVersioned(Seq("RESAMPLED#1", "RESAMPLED#2"), "RESAMPLED")
      == "RESAMPLED#3")
    // unnumbered existing counts as #1
    assert(Naming.nextVersioned(Seq("RESAMPLED"), "RESAMPLED") == "RESAMPLED#2")
    // versions of other bases don't interfere
    assert(Naming.nextVersioned(Seq("RAW#5"), "RESAMPLED") == "RESAMPLED#1")
  }

  test("newSeriesName keeps the versioned signal part, swaps the suffix") {
    assert(Naming.newSeriesName("A#1", "RESAMPLED") == "A#1_RESAMPLED")
    assert(Naming.newSeriesName("A", "LIN-INT") == "A#1_LIN-INT")
  }
}
