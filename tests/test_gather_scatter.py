"""ONNX/torch-semantics parity for the gather/scatter op family.

Oracles: numpy for gather variants, torch (CPU) for gather_elements /
scatter_elements, hand-rolled loops for the scatter reductions.  Mirrors
the reference's kernel tests for ``operations/gather_scatter.mojo``.
"""

import numpy as np
import pytest
import torch

from bm25_tpu.ops.gather_scatter import (
    gather,
    gather_elements,
    gather_nd,
    gather_nd_shape,
    gather_reduce,
    gather_shape,
    scatter_elements,
    scatter_nd,
    scatter_nd_shape,
)
from bm25_tpu.ops.registry import custom, get_op, list_ops


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_gather_matches_numpy_take(rng):
    data = rng.standard_normal((7, 5, 3)).astype(np.float32)
    for axis in (0, 1, 2, -1):
        idx = rng.integers(0, data.shape[axis], size=(4, 2))
        np.testing.assert_array_equal(
            np.asarray(gather(data, idx, axis=axis)),
            np.take(data, idx, axis=axis),
        )


def test_gather_negative_indices(rng):
    data = rng.standard_normal((6, 4)).astype(np.float32)
    idx = np.array([-1, -6, 2])
    np.testing.assert_array_equal(
        np.asarray(gather(data, idx)), data[[5, 0, 2]]
    )


def test_gather_reduce_is_masked_row_sum(rng):
    data = rng.standard_normal((9, 4)).astype(np.float32)
    idx = np.array([[0, 3, 3, -1], [-1, -1, -1, -1], [8, 0, -1, 5]])
    got = np.asarray(gather_reduce(data, idx))
    want = np.stack([
        data[0] + data[3] + data[3],
        np.zeros(4, np.float32),
        data[8] + data[0] + data[5],
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_reduce_batched_1d_features(rng):
    # 1-D data (the BM25 per-token score vector case)
    data = rng.standard_normal(11).astype(np.float32)
    idx = rng.integers(-1, 11, size=(3, 2, 5))
    got = np.asarray(gather_reduce(data, idx))
    mask = idx >= 0
    want = np.sum(np.where(mask, data[np.where(mask, idx, 0)], 0.0), axis=-1)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_gather_elements_matches_torch(rng):
    data = rng.standard_normal((5, 6)).astype(np.float32)
    idx = rng.integers(0, 5, size=(3, 6))
    got = np.asarray(gather_elements(data, idx, axis=0))
    want = torch.gather(torch.from_numpy(data), 0, torch.from_numpy(idx)).numpy()
    np.testing.assert_array_equal(got, want)
    idx1 = rng.integers(0, 6, size=(5, 2))
    got1 = np.asarray(gather_elements(data, idx1, axis=1))
    want1 = torch.gather(torch.from_numpy(data), 1, torch.from_numpy(idx1)).numpy()
    np.testing.assert_array_equal(got1, want1)


def test_gather_nd_basic_and_batched(rng):
    data = rng.standard_normal((4, 5, 6)).astype(np.float32)
    # r == 2: picks (i, j) -> vector of length 6
    idx = np.array([[0, 1], [3, 4], [2, 0]])
    got = np.asarray(gather_nd(data, idx))
    np.testing.assert_array_equal(got, data[idx[:, 0], idx[:, 1]])
    # batch_dims=1: per-batch row lookup
    bidx = rng.integers(0, 5, size=(4, 3, 1))
    gotb = np.asarray(gather_nd(data, bidx, batch_dims=1))
    wantb = np.stack([data[b][bidx[b, :, 0]] for b in range(4)])
    np.testing.assert_array_equal(gotb, wantb)


def test_scatter_elements_none_and_add_match_torch(rng):
    data = rng.standard_normal((6, 4)).astype(np.float32)
    idx = rng.integers(0, 6, size=(3, 4))
    upd = rng.standard_normal((3, 4)).astype(np.float32)
    td, ti, tu = map(torch.from_numpy, (data, idx, upd))
    np.testing.assert_array_equal(
        np.asarray(scatter_elements(data, idx, upd, axis=0)),
        td.scatter(0, ti, tu).numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(scatter_elements(data, idx, upd, axis=0, reduction="add")),
        td.scatter_add(0, ti, tu).numpy(),
        rtol=1e-6,
    )


@pytest.mark.parametrize("reduction", ["mul", "max", "min"])
def test_scatter_elements_reductions_match_loop(rng, reduction):
    data = rng.standard_normal((5, 3)).astype(np.float32)
    idx = rng.integers(0, 5, size=(4, 3))
    upd = rng.standard_normal((4, 3)).astype(np.float32)
    want = data.copy()
    op = {"mul": np.multiply, "max": np.maximum, "min": np.minimum}[reduction]
    for r in range(4):
        for c in range(3):
            want[idx[r, c], c] = op(want[idx[r, c], c], upd[r, c])
    np.testing.assert_allclose(
        np.asarray(scatter_elements(data, idx, upd, axis=0, reduction=reduction)),
        want,
        rtol=1e-6,
    )


def test_scatter_elements_axis1_and_bad_reduction(rng):
    data = rng.standard_normal((3, 7)).astype(np.float32)
    idx = rng.integers(0, 7, size=(3, 2))
    upd = rng.standard_normal((3, 2)).astype(np.float32)
    td, ti, tu = map(torch.from_numpy, (data, idx, upd))
    np.testing.assert_array_equal(
        np.asarray(scatter_elements(data, idx, upd, axis=1)),
        td.scatter(1, ti, tu).numpy(),
    )
    with pytest.raises(ValueError, match="unknown reduction"):
        scatter_elements(data, idx, upd, reduction="avg")


def test_scatter_nd_set_and_add(rng):
    data = np.zeros((4, 3), np.float32)
    idx = np.array([[0], [2], [2]])
    upd = np.ones((3, 3), np.float32)
    got = np.asarray(scatter_nd(data, idx, upd))
    want = np.zeros((4, 3), np.float32)
    want[0] = 1.0
    want[2] = 1.0  # last write wins for duplicate index under "none"
    np.testing.assert_array_equal(got, want)
    got_add = np.asarray(scatter_nd(data, idx, upd, reduction="add"))
    want_add = np.zeros((4, 3), np.float32)
    want_add[0] = 1.0
    want_add[2] = 2.0
    np.testing.assert_array_equal(got_add, want_add)


def test_shape_inference_matches_op_outputs(rng):
    data = rng.standard_normal((4, 5, 6)).astype(np.float32)
    idx = np.zeros((2, 3), np.int32)
    assert gather_shape(data.shape, idx.shape, axis=1) == tuple(
        gather(data, idx, axis=1).shape
    )
    nd_idx = np.zeros((7, 2), np.int32)
    assert gather_nd_shape(data.shape, nd_idx.shape) == tuple(
        gather_nd(data, nd_idx).shape
    )
    assert scatter_nd_shape((4, 3), (3, 1), (3, 3)) == (4, 3)
    with pytest.raises(ValueError, match="incompatible"):
        scatter_nd_shape((4, 3), (3, 1), (3, 2))


def test_ops_are_registered_and_invokable():
    names = list_ops()
    for n in ("gather", "gather_reduce", "gather_elements", "gather_nd",
              "scatter_elements", "scatter_nd"):
        assert n in names
        assert callable(get_op(n))
    data = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.testing.assert_array_equal(
        np.asarray(custom("gather", data, np.array([2, 0]))), data[[2, 0]]
    )


# -- generic reductions (reference reduce_fn/reduce_init parity, VERDICT r1) --


def test_gather_reduce_named_reductions_vs_numpy():
    from bm25_tpu.ops.gather_scatter import gather_reduce

    rng = np.random.default_rng(21)
    data = rng.normal(size=(40, 6)).astype(np.float32)
    idx = rng.integers(-1, 40, size=(9, 5), dtype=np.int32)  # incl. pads
    for name, npfn, init in [
        ("sum", np.sum, 0.0),
        ("max", np.max, -np.inf),
        ("min", np.min, np.inf),
        ("prod", np.prod, 1.0),
    ]:
        got = np.asarray(gather_reduce(data, idx, reduce_fn=name))
        want = np.empty((9, 6), np.float32)
        for r in range(9):
            rows = data[idx[r][idx[r] >= 0]]
            want[r] = npfn(rows, axis=0) if len(rows) else init
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_reduce_mean_ignores_padding():
    from bm25_tpu.ops.gather_scatter import gather_reduce

    data = np.array([[2.0], [4.0], [12.0]], np.float32)
    idx = np.array([[0, 1, -1, -1], [2, -1, -1, -1]], np.int32)
    got = np.asarray(gather_reduce(data, idx, reduce_fn="mean"))
    np.testing.assert_allclose(got, [[3.0], [12.0]])


def test_gather_reduce_int_max_identity():
    from bm25_tpu.ops.gather_scatter import gather_reduce

    data = np.array([[5], [-7]], np.int32)
    idx = np.array([[0, 1], [-1, -1]], np.int32)  # second row: all padding
    got = np.asarray(gather_reduce(data, idx, reduce_fn="max"))
    assert got[0, 0] == 5 and got[1, 0] == np.iinfo(np.int32).min


def test_gather_reduce_callable_fn():
    import jax.numpy as jnp

    from bm25_tpu.ops.gather_scatter import gather_reduce

    data = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    idx = np.array([[0, 1]], np.int32)
    got = np.asarray(
        gather_reduce(data, idx, reduce_fn=jnp.max, reduce_init=-np.inf)
    )
    np.testing.assert_allclose(got, [[3.0, 4.0]])
    with pytest.raises(ValueError, match="reduce_init"):
        gather_reduce(data, idx, reduce_fn=jnp.max)
    with pytest.raises(ValueError, match="unknown reduce_fn"):
        gather_reduce(data, idx, reduce_fn="median")


def test_scatter_nd_update_fn():
    """Arbitrary update lambda, the reference scatter_nd_generator hook."""
    from bm25_tpu.ops.gather_scatter import scatter_nd

    data = np.arange(6, dtype=np.float32).reshape(3, 2)
    idx = np.array([[0], [2]], np.int32)
    upd = np.array([[10.0, 10.0], [1.0, 1.0]], np.float32)
    got = np.asarray(
        scatter_nd(data, idx, upd, update_fn=lambda old, u: old * 2 + u)
    )
    np.testing.assert_allclose(got, [[10.0, 12.0], [2.0, 3.0], [9.0, 11.0]])
