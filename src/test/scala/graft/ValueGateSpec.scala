package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the round-10 advice finding: ValueGate's recall
  * denominators were pass-open — an ANN query returning ZERO rows gave
  * 0.0/0 = NaN, `NaN < floor` is false in Scala, so a totally broken
  * index exited 0 and the JSON emit printed the invalid literal NaN;
  * an index answering 1 of 50 queries perfectly scored 1.0. The fixed
  * scoring ([[ValueGate.recallOf]]/[[ValueGate.clsRecallOf]]) uses the
  * FULL exact reference set as the denominator, so both failure shapes
  * score what they deserve and NaN cannot arise. */
class ValueGateSpec extends AnyFunSuite {

  private val exact: Map[Long, Set[Long]] =
    (0L until 50L).map(q => q -> Set(q * 10, q * 10 + 1, q * 10 + 2)).toMap

  test("empty ANN answer scores 0.0, not NaN (gate must stay closed)") {
    val r = ValueGate.recallOf(Map.empty, exact)
    assert(!r.isNaN && r == 0.0)
    val c = ValueGate.clsRecallOf(Map.empty, exact)
    assert(!c.isNaN && c == 0.0)
    // the old semantics: hits/(ann.size*3) = 0/0 — this is what the fix removes
    assert((0.0 / 0.0).isNaN) // documents why the guard exists
  }

  test("answering 1 of 50 queries perfectly scores 1/50, not 1.0") {
    val ann = Map(7L -> exact(7L))
    assert(ValueGate.recallOf(ann, exact) === 1.0 / 50)
    assert(ValueGate.clsRecallOf(ann, exact) === 1.0 / 50)
  }

  test("full perfect answer scores 1.0; half-right answers score 0.5") {
    assert(ValueGate.recallOf(exact, exact) === 1.0)
    assert(ValueGate.clsRecallOf(exact, exact) === 1.0)
    // drop 1-2 of each query's 3 hits
    val partial = exact.map { case (q, s) => q -> s.take(if (q % 2 == 0) 1 else 2) }
    val r = ValueGate.recallOf(partial, exact)
    assert(r === (25 * 1 + 25 * 2).toDouble / 150)
  }

  test("wrong-id answers score 0 even when every query answers") {
    val wrong = exact.map { case (q, _) => q -> Set(q + 100000L) }
    assert(ValueGate.recallOf(wrong, exact) === 0.0)
    assert(ValueGate.clsRecallOf(wrong, exact) === 0.0)
  }

  test("empty exact reference is refused loudly, never divided by") {
    intercept[IllegalArgumentException](ValueGate.recallOf(Map.empty, Map.empty))
    intercept[IllegalArgumentException](ValueGate.clsRecallOf(Map.empty, Map.empty))
  }
}
