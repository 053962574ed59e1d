"""GraphSymmetryFinder / DynamicPartition / SparsePermutation tests
(reference find_graph_symmetries.h, dynamic_partition.h,
sparse_permutation.h) + lp_decomposer (lp_data/lp_decomposer.cc)."""

import numpy as np
import scipy.sparse as sp

from ortools_tpu.algorithms.symmetry import (
    DynamicPartition,
    GraphSymmetryFinder,
    SparsePermutation,
)


def _group_order_via_orbit_stab(n, gens, max_iter=100000):
    """|G| lower bound via BFS closure on permutations (small groups)."""
    from itertools import product
    ident = tuple(range(n))
    maps = [tuple(g.to_mapping()) for g in gens]
    seen = {ident}
    frontier = [ident]
    it = 0
    while frontier and it < max_iter:
        nxt = []
        for p in frontier:
            for g in maps:
                q = tuple(g[p[i]] for i in range(n))
                if q not in seen:
                    seen.add(q)
                    nxt.append(q)
                it += 1
        frontier = nxt
    return len(seen)


def test_sparse_permutation_roundtrip():
    p = SparsePermutation.from_mapping([1, 2, 0, 3, 5, 4])
    assert sorted(map(tuple, map(sorted, p.cycles))) == [(0, 1, 2), (4, 5)]
    assert p.to_mapping() == [1, 2, 0, 3, 5, 4]
    assert p.apply(0) == 1 and p.apply(3) == 3
    assert sorted(p.support()) == [0, 1, 2, 4, 5]


def test_dynamic_partition_refine():
    dp = DynamicPartition(6)
    assert dp.num_parts == 1
    new = dp.refine([0, 2, 4])
    assert len(new) == 1
    assert sorted(dp.part(new[0])) == [0, 2, 4]
    assert sorted(dp.part(0)) == [1, 3, 5]
    # refining by a whole part is a no-op
    assert dp.refine([1, 3, 5]) == []
    new2 = dp.refine([0])
    assert sorted(dp.part(new2[0])) == [0]


def test_cycle_graph_automorphisms():
    # C_5: automorphism group = dihedral of order 10.
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)]
    f = GraphSymmetryFinder(n, edges)
    gens = f.find_generators()
    assert gens, "cycle graph must have nontrivial automorphisms"
    for g in gens:
        perm = g.to_mapping()
        assert f._is_automorphism(perm)
    assert _group_order_via_orbit_stab(n, gens) == 10


def test_colors_restrict_automorphisms():
    # path a-b-c with endpoint colors distinct: only the identity remains.
    edges = [(0, 1), (1, 2)]
    f = GraphSymmetryFinder(3, edges, node_colors=[0, 1, 2])
    assert f.find_generators() == []
    # same path with symmetric colors: the flip survives
    f2 = GraphSymmetryFinder(3, edges, node_colors=[0, 1, 0])
    gens = f2.find_generators()
    assert any(g.to_mapping() == [2, 1, 0] for g in gens)


def test_petersen_graph_order():
    # Petersen graph: |Aut| = 120.
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, 5 + i) for i in range(5)]
    f = GraphSymmetryFinder(10, outer + inner + spokes)
    gens = f.find_generators()
    assert _group_order_via_orbit_stab(10, gens) == 120


def test_lp_decomposer_blocks_and_recombine():
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.models.lp_decomposer import decompose
    from ortools_tpu.glop import solve as glop_solve

    # two independent LPs interleaved in one matrix
    a = sp.csr_matrix(np.array([
        [1.0, 0.0, 1.0, 0.0],
        [0.0, 2.0, 0.0, 1.0],
    ]))
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 1.0, 2.0, 3.0]),
        constraint_matrix=a,
        constraint_lower=np.array([2.0, 3.0]),
        constraint_upper=np.array([np.inf, np.inf]),
        variable_lower=np.zeros(4),
        variable_upper=np.full(4, 10.0),
    )
    dec = decompose(qp)
    assert len(dec.blocks) == 2
    xs, ys = [], []
    for blk in dec.blocks:
        r = glop_solve(blk)
        xs.append(r.primal_solution)
        ys.append(r.dual_solution)
    x = dec.assemble_solution(xs)
    y = dec.assemble_duals(ys)
    full = glop_solve(qp)
    assert abs(qp.objective_vector @ x - full.objective_value) <= 1e-9
    assert np.all(a @ x >= qp.constraint_lower - 1e-9)
    assert y.shape == (2,)
