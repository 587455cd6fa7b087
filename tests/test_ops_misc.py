"""Gather/scatter family, matmul kernels, shape ops, registry."""

import jax.numpy as jnp
import numpy as np
import pytest

from bm25_tpu.ops import gather_scatter as gs
from bm25_tpu.ops.matmul import matmul
from bm25_tpu.ops.registry import custom, get_op, list_ops, register_op
from bm25_tpu.ops.shape_ops import arange, arange_shape, reshape, reshape_shape


# -- gather family ------------------------------------------------------------


def test_gather_axis_and_negative_indices():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(
        np.asarray(gs.gather(jnp.asarray(x), jnp.asarray([2, -3]), axis=0)),
        x[[2, 0]],
    )
    np.testing.assert_array_equal(
        np.asarray(gs.gather(jnp.asarray(x), jnp.asarray([-1]), axis=1)),
        x[:, [3]],
    )
    assert gs.gather_shape((3, 4), (2, 5), axis=1) == (3, 2, 5)


def test_gather_reduce_is_embeddingbag_sum():
    table = np.arange(20, dtype=np.float32).reshape(5, 4)
    idx = np.array([[0, 2, -1], [4, 4, 4]], np.int32)
    out = np.asarray(gs.gather_reduce(jnp.asarray(table), jnp.asarray(idx)))
    np.testing.assert_allclose(out[0], table[0] + table[2])
    np.testing.assert_allclose(out[1], 3 * table[4])


def test_gather_elements_matches_take_along_axis():
    x = np.random.default_rng(0).random((4, 5)).astype(np.float32)
    idx = np.array([[0, 4, 2, 1, 3]] * 4)
    np.testing.assert_array_equal(
        np.asarray(gs.gather_elements(jnp.asarray(x), jnp.asarray(idx), axis=1)),
        np.take_along_axis(x, idx, axis=1),
    )


def test_gather_nd():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]])
    np.testing.assert_array_equal(
        np.asarray(gs.gather_nd(jnp.asarray(x), jnp.asarray(idx))),
        np.stack([x[0, 1], x[1, 2]]),
    )
    assert gs.gather_nd_shape((2, 3, 4), (2, 2)) == (2, 4)


def test_scatter_nd_reductions():
    x = np.zeros((4, 3), np.float32)
    idx = np.array([[1], [1], [3]])
    upd = np.ones((3, 3), np.float32)
    out = np.asarray(gs.scatter_nd(jnp.asarray(x), jnp.asarray(idx),
                                   jnp.asarray(upd), reduction="add"))
    np.testing.assert_array_equal(out[1], [2, 2, 2])
    np.testing.assert_array_equal(out[3], [1, 1, 1])
    np.testing.assert_array_equal(out[0], 0)
    with pytest.raises(ValueError):
        gs.scatter_nd_shape((4, 3), (3, 1), (3, 9))


def test_scatter_elements():
    x = np.zeros((3, 4), np.float32)
    idx = np.array([[0, 1], [2, 0], [1, 3]])
    upd = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    out = np.asarray(gs.scatter_elements(jnp.asarray(x), jnp.asarray(idx),
                                         jnp.asarray(upd), axis=1))
    expected = np.zeros((3, 4))
    for r in range(3):
        for c in range(2):
            expected[r, idx[r, c]] = upd[r, c]
    np.testing.assert_array_equal(out, expected)


# -- matmul -------------------------------------------------------------------


@pytest.mark.parametrize("algorithm", ["xla", "naive", "optimized"])
def test_matmul_algorithms(algorithm):
    rng = np.random.default_rng(1)
    # deliberately non-aligned shapes
    a = rng.standard_normal((67, 130)).astype(np.float32)
    b = rng.standard_normal((130, 200)).astype(np.float32)
    out = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), algorithm=algorithm))
    np.testing.assert_allclose(out, a @ b, rtol=1e-4, atol=1e-4)


def test_matmul_analytic_corner_values():
    """The reference's GPU integration test pattern: a[r,c]=r-c, b[r,c]=r+c,
    asserted corner values (/root/reference/test_correctness.mojo:42-112)."""
    n = 32
    r = np.arange(n, dtype=np.float32)
    a = r[:, None] - r[None, :]
    b = r[:, None] + r[None, :]
    out = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), algorithm="optimized"))
    np.testing.assert_allclose(out, a @ b, rtol=1e-5)


def test_matmul_shape_error():
    with pytest.raises(ValueError, match="incompatible"):
        matmul(jnp.zeros((2, 3)), jnp.zeros((4, 5)))


def test_naive_tile_shrink_stays_mosaic_legal():
    """The VMEM shrink loop must never emit a sublane tile below 8 or off
    8-alignment (e.g. 48 -> 24 -> 12 -> 6 under a bare halving), nor a
    lane tile off 128-alignment — those fail to compile on hardware."""
    from bm25_tpu.ops.matmul import _shrink_naive_tiles

    kb = 8192 * 4  # f32 K=8192 row bytes: forces deep shrinking
    for tm0 in (48, 24, 40, 256, 8):
        for tn0 in (256, 128, 384):
            tm, tn = _shrink_naive_tiles(tm0, tn0, kb, budget=10 << 20)
            assert tm >= 8 and tm % 8 == 0, (tm0, tn0, tm)
            assert tn >= 128 and tn % 128 == 0, (tm0, tn0, tn)
            # and the result actually meets the budget when shrunk to floor
            if (tm, tn) != (tm0, tn0):
                assert 2 * (tm * kb + kb * tn + tm * tn * 4) <= 10 << 20 or (
                    tm == 8 and tn == 128
                )


# -- shape ops ------------------------------------------------------------------


def test_reshape_inference_and_errors():
    assert reshape_shape((2, 3, 4), (6, -1)) == (6, 4)
    assert reshape(jnp.zeros((2, 3, 4)), (-1,)).shape == (24,)
    with pytest.raises(ValueError):
        reshape_shape((2, 3), (-1, -1))
    with pytest.raises(ValueError):
        reshape_shape((2, 3), (5,))


def test_arange_validation():
    np.testing.assert_array_equal(np.asarray(arange(5)), np.arange(5))
    np.testing.assert_array_equal(
        np.asarray(arange(1, 10, 3)), np.arange(1, 10, 3)
    )
    with pytest.raises(ValueError):
        arange_shape(0, 10, 0)
    with pytest.raises(ValueError):
        arange_shape(10, 0, 1)


# -- registry -------------------------------------------------------------------


def test_registry_dispatch_and_custom():
    @register_op("test_double", target="cpu")
    def _double_cpu(x):
        return x * 2

    assert custom("test_double", 21, target="cpu") == 42
    assert "test_double" in list_ops()
    with pytest.raises(KeyError, match="no implementation"):
        get_op("test_double", target="tpu")
    with pytest.raises(KeyError, match="unknown op"):
        get_op("never_registered")
    # built-in ops present (component parity with operations/*.mojo)
    for name in ["top_k", "gather", "scatter_nd", "matrix_multiplication",
                 "reshape", "arange", "gather_reduce"]:
        assert name in list_ops()


def test_matmul_optimized_large_output_noacc_path():
    """f32 outputs above the C-resident cap route to the no-scratch
    square-tiled kernel (accumulates into o_ref); exactness vs numpy."""
    rng = np.random.default_rng(21)
    a = rng.standard_normal((1500, 70)).astype(np.float32)
    b = rng.standard_normal((70, 1500)).astype(np.float32)
    out = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), algorithm="optimized"))
    np.testing.assert_allclose(out, a @ b, rtol=1e-4, atol=1e-4)


def test_matmul_optimized_bf16_uses_f32_scratch():
    """Narrow output dtypes keep the f32 accumulator scratch — a bf16
    o_ref accumulation would lose low bits every K step."""
    rng = np.random.default_rng(22)
    a = rng.standard_normal((64, 700)).astype(np.float32)
    b = rng.standard_normal((700, 96)).astype(np.float32)
    out = matmul(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
                 algorithm="optimized")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), a @ b,
                               rtol=0.08, atol=0.5)
