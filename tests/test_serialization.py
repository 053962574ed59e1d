"""CP model JSON serialization round-trip tests."""

from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL
from ortools_tpu.sat.serialization import model_from_json, model_to_json


def build_rich_model():
    m = CpModel()
    x = m.new_int_var(0, 10, "x")
    y = m.new_int_var(0, 10, "y")
    b = m.new_bool_var("b")
    m.add(x + 2 * y <= 14)
    m.add(x != 3)
    m.add_all_different([x, y])
    m.add_max_equality(m.new_int_var(0, 20, "mx"), [x, y])
    m.add_multiplication_equality(m.new_int_var(0, 100, "p"), x, y)
    m.add_element(m.new_int_var(0, 1, "i"), [x, y],
                  m.new_int_var(0, 10, "t"))
    m.add_allowed_assignments([x, y], [(1, 4), (0, 7), (2, 8)])
    m.add(y >= 5).only_enforce_if(b)
    iv = m.new_fixed_size_interval_var(x, 3, "iv")
    iv2 = m.new_fixed_size_interval_var(y, 2, "iv2")
    m.add_no_overlap([iv, iv2])
    m.add_hint(x, 1)
    m.maximize(x + y)
    return m


def test_roundtrip_preserves_solution():
    m = build_rich_model()
    s1 = CpSolver()
    assert s1.solve(m) == OPTIMAL
    text = model_to_json(m.ir, indent=1)
    ir2 = model_from_json(text)
    from ortools_tpu.sat.params import SatParameters
    from ortools_tpu.sat.solver import solve_model
    r2 = solve_model(ir2, SatParameters())
    assert r2.status == OPTIMAL
    assert r2.objective_value == s1.objective_value


def test_roundtrip_is_stable():
    m = build_rich_model()
    t1 = model_to_json(m.ir)
    t2 = model_to_json(model_from_json(t1))
    assert t1 == t2
