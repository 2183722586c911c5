"""Native offline-pipeline kernels (round 5) vs their numpy references.

The C++ kernels exist so the dataset/partition phases survive papers100M
magnitude (SCALE_r04: rmat gen 2,570 s, closure extraction 2,112 s at 0.5B
edges in numpy); these tests pin bit-identity (CSR build, closure, extract,
histogram) and statistical parity (RMAT edge distribution) at small scale.
"""
import numpy as np
import pytest

from pagraph_tpu.data.synthetic import rmat_coo, rmat_csr, random_coo
from pagraph_tpu.graph import CSRGraph
from pagraph_tpu.partition.utils import extract_partition, hop_closure

native = pytest.importorskip("pagraph_tpu.sampling.native")
try:
    native.get_lib()
except Exception:  # pragma: no cover - toolchain missing
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def graph():
    return CSRGraph.from_coo(random_coo(500, 4000, seed=2))


def test_coo_to_csr_matches_scipy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 300, 5000).astype(np.int32)
    dst = rng.integers(0, 300, 5000).astype(np.int32)
    import scipy.sparse as spsp
    coo = spsp.coo_matrix(
        (np.ones(len(src), np.float32), (dst, src)), shape=(300, 300))
    ref = CSRGraph.from_coo(coo)
    got = native.coo_to_csr_native(src, dst, 300)
    np.testing.assert_array_equal(got.indptr, ref.indptr)
    np.testing.assert_array_equal(got.indices, ref.indices)
    np.testing.assert_array_equal(got.out_degrees, ref.out_degrees)


def test_coo_to_csr_drop_self():
    src = np.array([0, 1, 1, 2, 2], dtype=np.int32)
    dst = np.array([0, 2, 2, 1, 2], dtype=np.int32)
    g = native.coo_to_csr_native(src, dst, 3, drop_self=True)
    assert g.num_edges == 2           # (1->2 dedup'd) + (2->1); self-loops gone
    assert list(g.in_neighbors(2)) == [1]
    assert list(g.in_neighbors(1)) == [2]


@pytest.mark.parametrize("hops", [1, 2, 3])
def test_hop_closure_native_identical(graph, hops):
    seeds = np.arange(0, 500, 17)
    ref_c, ref_i = hop_closure(graph, seeds, hops, backend="numpy")
    got_c, got_i = hop_closure(graph, seeds, hops, backend="native")
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_i, ref_i)


def test_hop_closure_exhausted_early():
    # A path graph 0<-1<-2: BFS from {0} exhausts before hops-1 levels.
    indptr = np.array([0, 1, 2, 2], dtype=np.int64)
    indices = np.array([1, 2], dtype=np.int32)
    g = CSRGraph(indptr, indices, np.bincount(indices, minlength=3))
    ref_c, ref_i = hop_closure(g, np.array([0]), 5, backend="numpy")
    got_c, got_i = hop_closure(g, np.array([0]), 5, backend="native")
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_i, ref_i)


@pytest.mark.parametrize("hops", [1, 2])
def test_extract_partition_bit_identical(graph, hops):
    labels = np.arange(500, dtype=np.int64) % 7
    train = np.arange(0, 500, 13)
    ref = extract_partition(graph, train, labels, hops, backend="numpy")
    got = extract_partition(graph, train, labels, hops, backend="native")
    np.testing.assert_array_equal(got.graph.indptr, ref.graph.indptr)
    np.testing.assert_array_equal(got.graph.indices, ref.graph.indices)
    np.testing.assert_array_equal(got.graph.out_degrees, ref.graph.out_degrees)
    np.testing.assert_array_equal(got.local2full, ref.local2full)
    np.testing.assert_array_equal(got.train_nids, ref.train_nids)
    np.testing.assert_array_equal(got.labels, ref.labels)


def test_rmat_native_distribution():
    """Native RMAT: right shape, exact edge count pre-dedup, no self-loops,
    power-law-ish skew matching the numpy generator's quadrant split."""
    g_nat = rmat_csr(12, 8, seed=5, backend="native")
    g_np = rmat_csr(12, 8, seed=5, backend="numpy")
    assert g_nat.num_nodes == g_np.num_nodes == 1 << 12
    # dedup'd counts are close (distribution parity, not bit parity)
    assert abs(g_nat.num_edges - g_np.num_edges) / g_np.num_edges < 0.02
    src, dst = native.rmat_edges_native(10, 8192, seed=1)
    assert (src != dst).all()
    assert src.min() >= 0 and src.max() < 1024
    # quadrant skew: the top half of the id space must be much lighter
    frac_hi = (src >= 512).mean()
    assert 0.1 < frac_hi < 0.43     # a+b = 0.76 mass in the low half per bit


def test_histogram_native():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 97, 10_000).astype(np.int32)
    np.testing.assert_array_equal(
        native.histogram_i32_native(v, 97), np.bincount(v, minlength=97))


def test_spmm_native_matches_scipy(graph):
    from pagraph_tpu.storage.feature_store import full_graph_mean_aggregate
    x = np.random.default_rng(4).random((500, 24), dtype=np.float32)
    ref = full_graph_mean_aggregate(graph, x, backend="scipy")
    got = full_graph_mean_aggregate(graph, x, backend="native")
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_random_i8_range():
    r = native.random_i8_native((1000, 16), seed=9)
    assert r.dtype == np.int8
    assert r.min() >= -127 and r.max() <= 127
    assert abs(float(r.mean())) < 3.0


def test_gather_rows_i8():
    rng = np.random.default_rng(5)
    src = rng.integers(-127, 128, (100, 7)).astype(np.int8)
    ids = rng.integers(0, 100, 33)
    np.testing.assert_array_equal(native.gather_rows_i8(src, ids), src[ids])


def test_spmm_i8_exact(graph):
    """int8-input SpMM == f32 SpMM of the dequantized matrix (the scale
    factors out of the neighbor sum)."""
    from pagraph_tpu.graph import gcn_norm
    from pagraph_tpu.storage.feature_store import full_graph_mean_aggregate

    rng = np.random.default_rng(8)
    x8 = rng.integers(-127, 128, (500, 24)).astype(np.int8)
    scale = rng.uniform(0.01, 2.0, 24).astype(np.float32)
    ref = full_graph_mean_aggregate(graph, x8.astype(np.float32) * scale,
                                    backend="scipy")
    norm = gcn_norm(graph)
    lo = native.spmm_mean_i8_native(graph, x8, scale, norm, 0, 250)
    hi = native.spmm_mean_i8_native(graph, x8, scale, norm, 250, 500)
    got = np.concatenate([lo, hi])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_chunked_neighborhood_labels(graph):
    from pagraph_tpu.data.synthetic import neighborhood_labels

    x = np.random.default_rng(9).random((500, 16), dtype=np.float32)
    dense = neighborhood_labels(graph, x, 13, seed=4)
    chunked = neighborhood_labels(graph, x, 13, seed=4, chunk_rows=97)
    # identical up to argmax ties under summation-order float noise
    assert (dense != chunked).mean() < 0.01


def test_build_prequantized_store(graph):
    from pagraph_tpu.graph import gcn_norm
    from pagraph_tpu.storage.feature_store import (build_prequantized,
                                                   full_graph_mean_aggregate)

    rng = np.random.default_rng(10)
    x8 = rng.integers(-127, 128, (500, 8)).astype(np.int8)
    store = build_prequantized(graph, x8, 1.0 / 127, preprocess="graphsage",
                               chunk=123)
    assert store.is_quantized(["features", "neigh"])
    assert store.fields["norm"].dtype == np.float32
    # dequantized neigh within its quantization step of the exact aggregate
    agg = full_graph_mean_aggregate(graph, x8.astype(np.float32) / 127,
                                    backend="scipy")
    deq = store.gather(["neigh"], np.arange(500))
    ns = store.scales["neigh"]
    assert np.all(np.abs(deq - agg) <= ns[None, :] * 0.5 + 1e-6)
    # gcn mode replaces features with the aggregate
    store2 = build_prequantized(graph, x8, 1.0 / 127, preprocess="gcn")
    deq2 = store2.gather(["features"], np.arange(500))
    assert np.all(np.abs(deq2 - agg) <= store2.scales["features"][None, :] * 0.5
                  + 1e-6)
