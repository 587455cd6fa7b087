"""Top-k op golden tests — the cases of /root/reference/test_topk.mojo:152-344
re-expressed against numpy oracles (both lax and pallas-interpret paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bm25_tpu.ops.topk import top_k, top_k_fused_sampling

IMPLS = ["lax", "pallas"]


def np_topk(x, k, axis=-1, largest=True):
    """Oracle: sorted, ties -> smaller index."""
    x = np.moveaxis(np.asarray(x, dtype=np.float64), axis, -1)
    key = -x if largest else x
    idx = np.argsort(key, axis=-1, kind="stable")[..., :k]
    vals = np.take_along_axis(x, idx, axis=-1)
    return np.moveaxis(vals, -1, axis), np.moveaxis(idx, -1, axis)


def check(x, k, axis=-1, largest=True, impl="lax"):
    v, i = top_k(jnp.asarray(x), k, axis=axis, largest=largest, implementation=impl)
    ev, ei = np_topk(x, k, axis=axis, largest=largest)
    np.testing.assert_allclose(np.asarray(v, np.float64), ev, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ei)


@pytest.mark.parametrize("impl", IMPLS)
def test_1d_arange(impl):
    # test_topk.mojo:152-172 — iota input, sorted output
    check(np.arange(12, dtype=np.float32), k=3, impl=impl)


def test_axis0_and_axis1():
    # test_topk.mojo:174-214
    x = np.array([[1.0, 9.0, 3.0], [7.0, 2.0, 8.0], [4.0, 6.0, 5.0]], np.float32)
    check(x, k=2, axis=0)
    check(x, k=2, axis=1)


def test_smallest():
    # largest=False (test_topk.mojo:196-205)
    x = np.array([5.0, 1.0, 4.0, 2.0, 3.0], np.float32)
    check(x, k=2, largest=False)
    xi = np.array([5, 1, 4, 2, 3], np.int32)
    v, i = top_k(jnp.asarray(xi), 2, largest=False)
    np.testing.assert_array_equal(np.asarray(v), [1, 2])
    np.testing.assert_array_equal(np.asarray(i), [1, 3])


@pytest.mark.parametrize("impl", IMPLS)
def test_all_identical_stable(impl):
    # duplicate stability incl. 33x33 (test_topk.mojo:216-238)
    x = np.full((33, 33), 7.0, np.float32)
    v, i = top_k(jnp.asarray(x), 5, implementation=impl)
    np.testing.assert_array_equal(np.asarray(i), np.tile(np.arange(5), (33, 1)))
    np.testing.assert_array_equal(np.asarray(v), np.full((33, 5), 7.0))


def test_k_equals_axis():
    # k = full axis (test_topk.mojo:240-247)
    x = np.array([3.0, 1.0, 2.0], np.float32)
    check(x, k=3)


def test_rank5():
    # rank-5 input (test_topk.mojo:256-265)
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 2, 2, 6)).astype(np.float32)
    check(x, k=2, axis=-1)
    check(x, k=2, axis=1)


def test_pallas_two_stage_large_n():
    """N large enough for multiple stage-1 blocks; vs lax path."""
    rng = np.random.default_rng(1)
    x = rng.random((4, 40000)).astype(np.float32)
    v1, i1 = top_k(jnp.asarray(x), 16, implementation="pallas")
    v2, i2 = top_k(jnp.asarray(x), 16, implementation="lax")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_duplicates_across_blocks():
    """Ties spanning stage-1 block boundaries keep smaller-index order."""
    x = np.zeros((2, 40000), np.float32)
    x[:, [5, 20000, 39999]] = 3.0
    v, i = top_k(jnp.asarray(x), 4, implementation="pallas")
    np.testing.assert_array_equal(
        np.asarray(i), [[5, 20000, 39999, 0], [5, 20000, 39999, 0]]
    )


def test_k_out_of_range():
    with pytest.raises(ValueError, match="out of range"):
        top_k(jnp.zeros(4), 5)


# -- fused sampling (test_topk.mojo:267-344) ---------------------------------


def test_sampling_returns_topk_member_and_topk_values():
    rng = np.random.default_rng(2)
    x = rng.random((6, 50)).astype(np.float32)
    key = jax.random.PRNGKey(1)  # seeded, like seed(1) at test_topk.mojo:146
    vals, sampled = top_k_fused_sampling(key, jnp.asarray(x), k=5)
    ev, ei = np_topk(x, 5)
    np.testing.assert_allclose(np.asarray(vals), ev, rtol=1e-6)
    assert sampled.shape == (6, 1)
    for r in range(6):
        assert int(sampled[r, 0]) in set(ei[r].tolist())


def test_sampling_temperature_zero_is_greedy():
    # temperature 0.0 case (test_topk.mojo:309-344)
    rng = np.random.default_rng(3)
    x = rng.random((4, 30)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    _, sampled = top_k_fused_sampling(key, jnp.asarray(x), k=5, temperature=0.0)
    np.testing.assert_array_equal(
        np.asarray(sampled)[:, 0], np.argmax(x, axis=1)
    )


def test_sampling_deterministic_for_fixed_key():
    x = jnp.asarray(np.random.default_rng(4).random((3, 40), np.float32))
    key = jax.random.PRNGKey(11)
    _, s1 = top_k_fused_sampling(key, x, k=8, temperature=0.7)
    _, s2 = top_k_fused_sampling(key, x, k=8, temperature=0.7)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sampling_3d():
    # rank-3 sampling (test_topk.mojo:267-302)
    x = jnp.asarray(np.random.default_rng(5).random((2, 3, 20), np.float32))
    vals, sampled = top_k_fused_sampling(jax.random.PRNGKey(0), x, k=4)
    assert vals.shape == (2, 3, 4) and sampled.shape == (2, 3, 1)


# -- hierarchical block-max top-k ---------------------------------------------


def test_blockwise_exact_vs_oracle():
    from bm25_tpu.ops.topk import top_k_blockwise

    rng = np.random.default_rng(9)
    x = rng.random((4, 50000)).astype(np.float32)
    v, i = top_k_blockwise(jnp.asarray(x), 50, block=256)
    ev, ei = np_topk(x, 50)
    np.testing.assert_allclose(np.asarray(v), ev, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_blockwise_heavy_ties_keep_contract():
    from bm25_tpu.ops.topk import top_k_blockwise

    rng = np.random.default_rng(10)
    # few distinct values -> massive ties inside and across blocks
    x = rng.choice([0.0, 1.0, 2.0], size=(6, 30000)).astype(np.float32)
    v, i = top_k_blockwise(jnp.asarray(x), 40, block=128)
    ev, ei = np_topk(x, 40)
    np.testing.assert_allclose(np.asarray(v), ev, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_blockwise_all_zero_rows():
    from bm25_tpu.ops.topk import top_k_blockwise

    x = jnp.zeros((3, 20000), jnp.float32)
    v, i = top_k_blockwise(x, 10, block=128)
    np.testing.assert_array_equal(np.asarray(i), np.tile(np.arange(10), (3, 1)))


def test_blockwise_falls_back_when_blocks_le_k():
    from bm25_tpu.ops.topk import top_k_blockwise

    rng = np.random.default_rng(11)
    x = rng.random((2, 1000)).astype(np.float32)
    v, i = top_k_blockwise(jnp.asarray(x), 100, block=128)  # nb=8 <= k
    ev, ei = np_topk(x, 100)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_blockwise_unaligned_n_with_padding():
    from bm25_tpu.ops.topk import top_k_blockwise

    rng = np.random.default_rng(12)
    x = rng.random((2, 33333)).astype(np.float32)
    v, i = top_k_blockwise(jnp.asarray(x), 20, block=256)
    ev, ei = np_topk(x, 20)
    np.testing.assert_array_equal(np.asarray(i), ei)


# -- tournament-tree top-k (large k) ------------------------------------------


def test_tree_exact_vs_oracle_large_k():
    from bm25_tpu.ops.topk import top_k_tree

    rng = np.random.default_rng(13)
    x = rng.random((3, 60000)).astype(np.float32)
    v, i = top_k_tree(jnp.asarray(x), 700)
    ev, ei = np_topk(x, 700)
    np.testing.assert_allclose(np.asarray(v), ev, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_tree_heavy_ties():
    from bm25_tpu.ops.topk import top_k_tree

    rng = np.random.default_rng(14)
    x = rng.choice([0.0, 1.0, 2.0], size=(4, 40000)).astype(np.float32)
    v, i = top_k_tree(jnp.asarray(x), 300)
    ev, ei = np_topk(x, 300)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_tree_unaligned_and_small():
    from bm25_tpu.ops.topk import top_k_tree

    rng = np.random.default_rng(15)
    x = rng.random((2, 12345)).astype(np.float32)
    v, i = top_k_tree(jnp.asarray(x), 50)
    ev, ei = np_topk(x, 50)
    np.testing.assert_array_equal(np.asarray(i), ei)
    # n below base -> plain top_k path
    v, i = top_k_tree(jnp.asarray(x[:, :100]), 10)
    ev, ei = np_topk(x[:, :100], 10)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_select_top_k_dispatch():
    from bm25_tpu.ops.topk import select_top_k

    rng = np.random.default_rng(16)
    x = rng.random((2, 30000)).astype(np.float32)
    for k in (5, 100, 600):
        v, i = select_top_k(jnp.asarray(x), k)
        ev, ei = np_topk(x, k)
        np.testing.assert_array_equal(np.asarray(i), ei)


# -- pallas fused sampling (TPU PRNG Gumbel-max) -------------------------------


def test_pallas_sampling_member_and_determinism():
    from bm25_tpu.ops.topk import top_k_fused_sampling

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((5, 60), np.float32))
    key = jax.random.PRNGKey(3)
    vals, s1 = top_k_fused_sampling(key, x, k=6, implementation="pallas")
    _, s2 = top_k_fused_sampling(key, x, k=6, implementation="pallas")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    ev, ei = np_topk(np.asarray(x), 6)
    for r in range(5):
        assert int(s1[r, 0]) in set(ei[r].tolist())


def test_pallas_sampling_respects_distribution():
    """With one dominant logit, sampling should almost always pick it."""
    from bm25_tpu.ops.topk import top_k_fused_sampling

    x = np.zeros((8, 30), np.float32)
    x[:, 7] = 50.0  # overwhelming winner
    _, s = top_k_fused_sampling(jax.random.PRNGKey(0), jnp.asarray(x), k=5,
                                temperature=1.0, implementation="pallas")
    np.testing.assert_array_equal(np.asarray(s)[:, 0], 7)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="the TPU interpreter's PRNG returns constant bits; seed "
           "sensitivity is only observable on hardware (validated on-chip)",
)
def test_pallas_sampling_seed_sensitivity():
    """Different PRNG keys must produce different draws at high temperature."""
    from bm25_tpu.ops.topk import top_k_fused_sampling

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((32, 60), np.float32))
    _, sa = top_k_fused_sampling(jax.random.PRNGKey(1), x, k=10,
                                 temperature=5.0, implementation="pallas")
    _, sb = top_k_fused_sampling(jax.random.PRNGKey(2), x, k=10,
                                 temperature=5.0, implementation="pallas")
    assert (np.asarray(sa) != np.asarray(sb)).any()


# -- integer dtypes through the tree path (ADVICE r1: INT_MIN padding) ---------


def test_int_dtype_tree_unaligned_n():
    """tree path on ints with unaligned n: INT_MIN group padding must
    never win (bitwise-NOT keys, not negation).  Forced to the tree —
    the measured auto dispatch routes 1-row small-k shapes to lax
    (scripts/exp_r4_topk_smallk.py)."""
    rng = np.random.default_rng(17)
    x = rng.integers(-(2**31) + 1, 2**31 - 1, size=(1, 5001), dtype=np.int32)
    v, i = top_k(jnp.asarray(x), 3, implementation="tree")
    ev, ei = np_topk(x, 3)
    np.testing.assert_array_equal(np.asarray(v), ev.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(i), ei)
    assert np.asarray(i).max() < 5001
    assert np.asarray(v).dtype == np.int32


def test_int_dtype_smallest_exact():
    """largest=False on ints must select exactly (no float32 rounding of the
    keys) and return exact values."""
    rng = np.random.default_rng(18)
    base = np.int32(2**30)
    # adjacent huge ints that would collide after a float32 round-trip
    x = (base + rng.permutation(6000).astype(np.int32))[None, :]
    v, i = top_k(jnp.asarray(x), 5, largest=False)
    ev, ei = np_topk(x, 5, largest=False)
    np.testing.assert_array_equal(np.asarray(v), ev.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(i), ei)
    v, i = top_k(jnp.asarray(x[:, :64]), 5, largest=False)
    ev, ei = np_topk(x[:, :64], 5, largest=False)
    np.testing.assert_array_equal(np.asarray(v), ev.astype(np.int64))


def test_int_dtype_extremes_with_ties():
    x = np.array(
        [[7, -(2**31), 2**31 - 1, 7, 2**31 - 1, -(2**31), 0]], dtype=np.int32
    )
    x = np.tile(x, (1, 750))  # n=5250 -> tree path
    for largest in (True, False):
        v, i = top_k(jnp.asarray(x), 4, largest=largest)
        ev, ei = np_topk(x, 4, largest=largest)
        np.testing.assert_array_equal(np.asarray(v), ev.astype(np.int64))
        np.testing.assert_array_equal(np.asarray(i), ei)


def test_top_k_tree_with_maxes_matches_tree():
    """Precomputed-maxes tree == plain tree (values, indices, tie order)."""
    from bm25_tpu.ops.topk import top_k_tree, top_k_tree_with_maxes

    rng = np.random.default_rng(11)
    x = rng.standard_normal((7, 16384)).astype(np.float32).round(1)  # ties
    x[:, :64] = 2.5  # heavy tie block
    maxes = x.reshape(7, -1, 8).max(-1)
    for k in (3, 100, 1000):
        v0, i0 = top_k_tree(jnp.asarray(x), k)
        v1, i1 = top_k_tree_with_maxes(jnp.asarray(x), jnp.asarray(maxes), k)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_top_k_tree_with_maxes_validates_shape():
    from bm25_tpu.ops.topk import top_k_tree_with_maxes

    x = jnp.zeros((2, 64))
    with pytest.raises(ValueError):
        top_k_tree_with_maxes(x, jnp.zeros((2, 7)), 3)


def test_top_k_tree_with_maxes_deeper_branch():
    """branch=16/32 group maxima stay exact with the same tie contract.

    Pins the GROUP-parametric wiring (ops.ell_score.GROUP feeds the
    tree's branch at every call site) so depth experiments can't silently
    break exactness.
    """
    from bm25_tpu.ops.topk import top_k_tree, top_k_tree_with_maxes

    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 16384)).astype(np.float32).round(1)
    x[:, 128:192] = 3.0  # tie block straddling group boundaries
    for branch in (16, 32):
        maxes = x.reshape(5, -1, branch).max(-1)
        for k in (10, 500):
            v0, i0 = top_k_tree(jnp.asarray(x), k)
            v1, i1 = top_k_tree_with_maxes(
                jnp.asarray(x), jnp.asarray(maxes), k, branch=branch
            )
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sparse_engine_group16_exact(monkeypatch):
    """The full engine stays oracle-exact with GROUP=16 fused maxima."""
    import sys

    import bm25_tpu.ops.ell_score  # noqa: F401 — ensure module registered

    # bm25_tpu.ops.__init__ rebinds the name `ell_score` to the FUNCTION,
    # so attribute-style imports resolve to it; go through sys.modules
    es = sys.modules["bm25_tpu.ops.ell_score"]
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    monkeypatch.setattr(es, "GROUP", 16)
    rng = np.random.default_rng(3)
    docs = [
        rng.integers(0, 900, size=rng.integers(5, 40)).astype(np.int32)
        for _ in range(9000)  # > max(2k, 4096) rows: tree path engages
    ]
    idx = build_scored_index(docs, vocab_size=900)
    eng = SparseEngine.from_scored_index(idx)
    ref = ReferenceEngine.from_scored_index(idx)
    q = rng.integers(0, 900, size=(8, 6)).astype(np.int32)
    dd, ss = eng.search(q, top_k=64)
    rd, rs = ref.search(q, top_k=64)
    np.testing.assert_array_equal(np.asarray(dd), rd)
    np.testing.assert_allclose(np.asarray(ss), rs, rtol=1e-5, atol=1e-5)


def test_pallas_topk_exhausted_rows_distinct_indices():
    """Rows with fewer than k finite entries must return DISTINCT indices
    (argmax over an all--inf row kept returning position 0)."""
    import numpy as np

    from bm25_tpu.ops.topk import top_k

    ninf = float("-inf")
    x = jnp.array([[5.0, ninf, ninf, ninf],
                   [ninf, 7.0, 3.0, ninf]], jnp.float32)
    v, i = top_k(x, 3, implementation="pallas")
    np.testing.assert_allclose(np.asarray(v)[0], [5.0, ninf, ninf])
    assert len(set(np.asarray(i)[0].tolist())) == 3, i
    assert np.asarray(i)[1][:2].tolist() == [1, 2]
    assert len(set(np.asarray(i)[1].tolist())) == 3, i
    # in-range everywhere
    assert (np.asarray(i) >= 0).all() and (np.asarray(i) < 4).all()


def test_pallas_topk_multiblock_lane_padding():
    """nblocks > 1 with k not a multiple of 128: the stage-1 output block
    pads to 128 lanes for Mosaic — results must still be exact."""
    import numpy as np

    from bm25_tpu.ops.topk import _PALLAS_CHUNK, top_k

    rng = np.random.default_rng(7)
    n = _PALLAS_CHUNK * 3 + 100  # forces nblocks > 1
    x = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    v, i = top_k(x, 16, implementation="pallas")
    vr, ir = jax.lax.top_k(x, 16)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))


def test_pallas_topk_rejects_int_inputs():
    import pytest

    from bm25_tpu.ops.topk import top_k

    with pytest.raises(TypeError, match="float"):
        top_k(jnp.arange(64, dtype=jnp.int32)[None, :], 4,
              implementation="pallas")


def test_fused_sampling_accepts_typed_prng_key():
    from bm25_tpu.ops.topk import top_k_fused_sampling

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64)),
                    jnp.float32)
    vals, idx = top_k_fused_sampling(jax.random.key(0), x, 5,
                                     implementation="pallas")
    assert vals.shape == (2, 5) and idx.shape == (2, 1)


def test_top_k_bool_input_tree_path():
    """bool inputs route through the tree path without the jnp.iinfo(bool)
    crash; order and tie contracts hold (True > False, smaller index)."""
    import numpy as np

    from bm25_tpu.ops.topk import top_k

    x = np.zeros((2, 5001), dtype=bool)
    x[0, [7, 4999]] = True
    x[1, 0] = True
    v, i = top_k(jnp.asarray(x), k=3)
    assert list(np.asarray(i[0])[:2]) == [7, 4999]
    assert bool(v[0][0]) and bool(v[0][1]) and not bool(v[0][2])
    assert int(i[1][0]) == 0
    # smallest=False variant exercises the ~x bool reversal
    v2, i2 = top_k(jnp.asarray(x), k=2, largest=False)
    assert not bool(v2[0][0])


def test_pallas_topk_k_wider_than_chunk_stays_distinct(monkeypatch):
    """k > chunk width cannot produce duplicate indices: the pallas path
    hands off to the tree (regression: exhausted-chunk fallback repeated
    position 0 at -inf on rows with < k finite values)."""
    import numpy as np

    from bm25_tpu.ops import topk as T

    monkeypatch.setattr(T, "_PALLAS_CHUNK", 256)
    monkeypatch.setattr(T, "_PALLAS_MAX_BLOCKS", 3)
    rng = np.random.default_rng(0)
    x = np.full((4, 600), -np.inf, np.float32)
    x[:, :40] = rng.random((4, 40))  # far fewer than k finite values
    v, i = T.top_k(jnp.asarray(x), k=300, implementation="pallas")
    for row in np.asarray(i):
        assert len(set(row.tolist())) == len(row), "duplicate indices"
    lv, li = T.top_k(jnp.asarray(x), k=300, implementation="lax")
    np.testing.assert_array_equal(np.asarray(v)[:, :40], np.asarray(lv)[:, :40])


def test_auto_dispatch_rule():
    """Pin the measured dispatch table (scripts/exp_r4_topk_smallk.py):
    lax for k<8 or few rows; the tree for k>=64 or (k>=8 with >=128
    rows); lax whenever n is too small for the tree to pay off."""
    from bm25_tpu.ops.topk import _auto_impl

    assert _auto_impl(131072, 1, 8) == "lax"
    assert _auto_impl(524288, 32, 32) == "lax"      # lax 1.75 vs tree 1.92 ms
    assert _auto_impl(131072, 64, 8) == "tree"      # tree 0.14 vs lax 0.20 ms
    assert _auto_impl(65536, 8, 128) == "tree"      # tree 0.21 vs lax 0.30 ms
    assert _auto_impl(524288, 1000, 512) == "tree"  # production headline
    assert _auto_impl(4096, 1000, 512) == "lax"     # n too small for the tree
