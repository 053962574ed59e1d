import pytest

from ortools_tpu.utils.domain import Domain, INT_MAX, INT_MIN


def test_basic_interval():
    d = Domain(1, 5)
    assert d.min() == 1 and d.max() == 5
    assert d.size() == 5
    assert d.contains(3) and not d.contains(6)
    assert not d.is_empty()


def test_empty_and_fixed():
    assert Domain(5, 1).is_empty()
    assert Domain.empty().is_empty()
    d = Domain(7, 7)
    assert d.is_fixed() and d.fixed_value() == 7


def test_from_values_merges_adjacent():
    d = Domain.from_values([1, 2, 3, 5, 7, 8])
    assert d.intervals() == [(1, 3), (5, 5), (7, 8)]
    assert d.size() == 6
    assert list(d) == [1, 2, 3, 5, 7, 8]


def test_from_flat_intervals():
    d = Domain.from_flat_intervals([0, 2, 5, 9])
    assert d.intervals() == [(0, 2), (5, 9)]
    assert d.flattened_intervals() == [0, 2, 5, 9]


def test_complement_roundtrip():
    d = Domain.from_intervals([(0, 2), (5, 9)])
    c = d.complement()
    assert not c.contains(1) and c.contains(3) and c.contains(10)
    assert c.complement() == d
    assert Domain.all_values().complement().is_empty()
    assert Domain.empty().complement() == Domain.all_values()


def test_negation():
    d = Domain.from_intervals([(1, 3), (5, 5)])
    assert d.negation().intervals() == [(-5, -5), (-3, -1)]
    assert d.negation().negation() == d


def test_intersection_union():
    a = Domain.from_intervals([(0, 5), (10, 20)])
    b = Domain.from_intervals([(3, 12)])
    assert a.intersection_with(b).intervals() == [(3, 5), (10, 12)]
    assert a.union_with(b).intervals() == [(0, 20)]


def test_addition_and_offset():
    a = Domain.from_values([0, 1])
    b = Domain.from_values([0, 2])
    assert sorted(a.addition_with(b)) == [0, 1, 2, 3]
    assert Domain(1, 3).offset(10).intervals() == [(11, 13)]


def test_multiplication():
    d = Domain.from_values([1, 2, 3])
    assert sorted(d.multiplication_by(2)) == [2, 4, 6]
    assert sorted(d.multiplication_by(-1)) == [-3, -2, -1]
    assert d.multiplication_by(0) == Domain(0, 0)


def test_inverse_multiplication():
    d = Domain(0, 10)
    # {v : 3v in [0,10]} = [0, 3]
    assert d.inverse_multiplication_by(3).intervals() == [(0, 3)]
    assert d.inverse_multiplication_by(-3).intervals() == [(-3, 0)]
    d2 = Domain.from_values([2, 4, 5])
    assert sorted(d2.inverse_multiplication_by(2)) == [1, 2]


def test_division():
    d = Domain(-7, 7)
    assert d.division_by(2).intervals() == [(-3, 3)]


def test_saturation():
    d = Domain(INT_MAX - 1, INT_MAX)
    assert d.offset(10).max() == INT_MAX
    assert Domain(INT_MIN, INT_MIN).negation().min() == INT_MAX  # capped


def test_is_included_in():
    assert Domain(2, 3).is_included_in(Domain(0, 5))
    assert not Domain(2, 7).is_included_in(Domain(0, 5))
    assert Domain(2, 3).is_included_in(Domain.all_values())
