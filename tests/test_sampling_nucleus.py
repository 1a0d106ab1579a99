"""The sort-free nucleus boundary (engine.nucleus_kth) vs the reference
sorted-prefix construction (HF top_p semantics, the implementation the
engine used through round 5 session 1).

The bisection replaces a full-vocab sort on the sampled-decode hot path
(the reference's default decode is do_sample T=0.1/top_p=0.7,
run_opus_ddp.py:156-158); these tests lock mask-level equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.infer import engine


def _sorted_kth(probs, top_p):
    """The original sorted-prefix construction (engine.sample_token pre
    round-5): keep the smallest descending prefix whose cumulative mass
    reaches top_p; kth = last kept prob (ties at kth included by the
    probs >= kth mask)."""
    sp = np.sort(probs, axis=-1)[..., ::-1]
    keep_mass = np.cumsum(sp, axis=-1) - sp
    cutoff = np.sum(keep_mass < top_p, axis=-1)
    return np.take_along_axis(sp, np.maximum(cutoff - 1, 0)[..., None],
                              axis=-1)[..., 0]


@pytest.mark.parametrize("v", [97, 4096])
@pytest.mark.parametrize("tp", [0.1, 0.5, 0.7, 0.95])
def test_bisection_matches_sorted_construction(v, tp):
    rng = np.random.default_rng(int(v * 100 * tp))
    logits = rng.standard_normal((6, v)).astype(np.float32) * 3.0
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref = _sorted_kth(probs, tp)
    got = np.asarray(engine.nucleus_kth(jnp.asarray(probs),
                                        jnp.float32(tp)))
    # the MASKS must be identical (kth itself must match one of the probs)
    np.testing.assert_array_equal(probs >= got[:, None],
                                  probs >= ref[:, None])
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_boundary_ties_included():
    # duplicate probs at the boundary: sorted construction keeps BOTH
    # (mask is probs >= kth); the threshold rule must agree
    probs = np.asarray([[0.4, 0.3, 0.3, 0.0]], np.float32)
    probs[0, 3] = 1.0 - probs[0, :3].sum()
    kth = np.asarray(engine.nucleus_kth(jnp.asarray(probs),
                                        jnp.float32(0.65)))
    assert kth[0] == np.float32(0.3)
    assert (probs[0] >= kth[0]).tolist() == [True, True, True, False]


def test_tiny_top_p_keeps_argmax_only():
    rng = np.random.default_rng(3)
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(rng.standard_normal((4, 257)).astype(np.float32) * 4)))
    kth = np.asarray(engine.nucleus_kth(jnp.asarray(probs),
                                        jnp.float32(1e-6)))
    np.testing.assert_allclose(kth, probs.max(-1), rtol=0, atol=0)


def test_top_p_one_keeps_everything():
    rng = np.random.default_rng(4)
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(rng.standard_normal((3, 129)).astype(np.float32))))
    kth = np.asarray(engine.nucleus_kth(jnp.asarray(probs),
                                        jnp.float32(1.0)))
    assert (probs >= kth[:, None]).all()


def test_warp_rows_greedy_rows_pass_through():
    """Greedy rows (t <= 0) no longer pay (or receive) the nucleus mask;
    sampled rows still get the exact sorted-construction mask."""
    rng = np.random.default_rng(5)
    logits = rng.standard_normal((3, 512)).astype(np.float32) * 3
    temps = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    tps = jnp.asarray([0.7, 0.7, 1.0], jnp.float32)
    out = np.asarray(engine.warp_logits_rows(jnp.asarray(logits), temps,
                                             tps))
    # greedy row: plain scaled logits, NO -inf anywhere
    assert np.isfinite(out[0]).all()
    # top_p=1 row: plain temperature scaling
    np.testing.assert_allclose(out[2], logits[2] / 1.0, rtol=1e-6)
    # sampled row: mask equals the sorted construction at T=0.5
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[1] / 0.5)))
    kth = _sorted_kth(probs[None], 0.7)[0]
    np.testing.assert_array_equal(np.isfinite(out[1]), probs >= kth)


def test_scalar_sampler_matches_rows_sampler_seeded():
    """sample_token (scalar T/top_p) and sample_token_rows must still draw
    identical tokens from identical keys after the sort-free rewrite."""
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((5, 321)).astype(np.float32)
                         * 3)
    for t, p in ((0.1, 0.7), (0.8, 0.4), (1.0, 1.0)):
        for seed in range(4):
            key = jax.random.PRNGKey(seed)
            a = engine.sample_token(logits, key, t, p)
            b = engine.sample_token_rows(
                logits, key, jnp.full((5,), t, jnp.float32),
                jnp.full((5,), p, jnp.float32))
            assert np.array_equal(np.asarray(a), np.asarray(b)), (t, p,
                                                                  seed)
