"""CSRGraph structure invariants."""
import numpy as np
import scipy.sparse as spsp

from pagraph_tpu.graph import CSRGraph, gcn_norm
from pagraph_tpu.data.synthetic import random_coo


def test_from_coo_roundtrip():
    coo = random_coo(50, 300, seed=1)
    g = CSRGraph.from_coo(coo)
    assert g.num_nodes == 50
    back = g.to_coo()
    # structural equality after dedup (edge multiplicity is dropped by design)
    a = coo.tocsr()
    a.sum_duplicates()
    a.data[:] = 1.0
    b = back.tocsr()
    b.data[:] = 1.0
    assert (a != b).nnz == 0
    assert g.num_edges == a.nnz


def test_degrees_consistent():
    coo = random_coo(80, 500, seed=2)
    g = CSRGraph.from_coo(coo)
    assert g.in_degrees.sum() == g.num_edges
    assert g.out_degrees.sum() == g.num_edges
    # out_degree[v] == number of rows whose neighbor list contains v
    counts = np.bincount(g.indices, minlength=g.num_nodes)
    np.testing.assert_array_equal(g.out_degrees, counts)


def test_subgraph_relabel_and_edges():
    coo = random_coo(60, 400, seed=3)
    g = CSRGraph.from_coo(coo)
    nodes = np.array([3, 7, 7, 12, 25, 40, 59])
    sub, sub2full = g.subgraph(nodes)
    assert len(sub2full) == 6  # dedup'd
    # every local edge corresponds to a full-graph edge
    full_edges = set()
    for v in range(g.num_nodes):
        for u in g.in_neighbors(v):
            full_edges.add((int(u), int(v)))
    for lv in range(sub.num_nodes):
        for lu in sub.in_neighbors(lv):
            assert (int(sub2full[lu]), int(sub2full[lv])) in full_edges
    # and every full-graph edge between selected nodes is present
    sel = set(int(x) for x in sub2full)
    full2sub = {int(f): i for i, f in enumerate(sub2full)}
    expected = [(u, v) for (u, v) in full_edges if u in sel and v in sel]
    got = set()
    for lv in range(sub.num_nodes):
        for lu in sub.in_neighbors(lv):
            got.add((int(sub2full[lu]), int(sub2full[lv])))
    assert got == set(expected)


def test_gcn_norm():
    coo = random_coo(40, 200, seed=4)
    g = CSRGraph.from_coo(coo)
    norm = gcn_norm(g)
    deg = g.in_degrees
    nz = deg > 0
    np.testing.assert_allclose(norm[nz], 1.0 / deg[nz])
    assert np.all(norm[~nz] == 0.0)
