"""Optimizer factories: schedules, bf16-moment Adam parity.

The bf16-moment transform (train/optim.py:scale_by_adam_lowp) must track
fp32 optax.adam closely: identical update rule, fp32 arithmetic, only the
stored moments are rounded to bfloat16 once per step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visitron_tpu.train.optim import (adamw_with_warmup, agent_optimizer,
                                      scale_by_adam_lowp)


def _run(opt, params, grads_seq):
    state = opt.init(params)
    out = []
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return params, state


def _tree_rand(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {f"p{i}": jax.random.normal(k, s)
            for i, (k, s) in enumerate(zip(ks, shapes))}


def test_adam_lowp_tracks_fp32_adam():
    key = jax.random.PRNGKey(0)
    shapes = [(17, 13), (64,), (3, 5, 7)]
    params = _tree_rand(key, shapes)
    grads_seq = [_tree_rand(jax.random.PRNGKey(100 + t), shapes)
                 for t in range(25)]

    ref = optax.adam(1e-3)
    lowp = optax.chain(scale_by_adam_lowp(),
                       optax.scale_by_learning_rate(1e-3))
    p_ref, _ = _run(ref, params, grads_seq)
    p_lowp, st_lowp = _run(lowp, params, grads_seq)

    # bf16 has an 8-bit mantissa: per-step moment rounding is ~2^-9 relative,
    # and the update magnitude is O(lr); after 25 steps the parameter drift
    # stays well under 1% of the total parameter movement.
    for k in params:
        moved = float(jnp.max(jnp.abs(p_ref[k] - params[k])))
        drift = float(jnp.max(jnp.abs(p_ref[k] - p_lowp[k])))
        assert drift < 0.01 * moved + 1e-6, (k, drift, moved)

    # the stored moments really are bfloat16
    adam_state = st_lowp[0]
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam_state.mu))
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam_state.nu))


def test_adam_lowp_fp32_storage_is_exact():
    """With moment_dtype=float32 the transform reproduces optax.adam bit-close
    (isolates the update-rule math from the storage rounding)."""
    key = jax.random.PRNGKey(1)
    shapes = [(11, 4), (9,)]
    params = _tree_rand(key, shapes)
    grads_seq = [_tree_rand(jax.random.PRNGKey(t), shapes) for t in range(10)]

    ref = optax.adam(1e-3)
    mine = optax.chain(scale_by_adam_lowp(moment_dtype=jnp.float32),
                       optax.scale_by_learning_rate(1e-3))
    p_ref, _ = _run(ref, params, grads_seq)
    p_mine, _ = _run(mine, params, grads_seq)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_ref[k]), np.asarray(p_mine[k]),
                                   rtol=1e-6, atol=1e-7)


def test_factories_accept_bf16_flag():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    for opt in (agent_optimizer(1e-4, "adam", 40.0, bf16_moments=True),
                adamw_with_warmup(5e-5, 10, 100, weight_decay=0.01,
                                  bf16_moments=True)):
        state = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        updates, state = opt.update(g, state, params)
        p2 = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(jax.tree.leaves(p2)[0])).all()
        # moments live in bf16 somewhere in the chain state
        dtypes = {x.dtype for x in jax.tree.leaves(state)
                  if hasattr(x, "dtype") and x.ndim > 0}
        assert any(d == jnp.bfloat16 for d in dtypes)

    # non-adam kinds ignore the flag rather than crash
    opt = agent_optimizer(1e-4, "rms", 40.0, bf16_moments=True)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    opt.update(g, state, params)


def test_adam_lowp_under_jit_and_grad_clip():
    """The full agent chain (clip 40 -> lowp adam -> lr) runs under jit and
    matches the fp32 chain on a short quadratic descent."""
    def loss_fn(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum(p["b"] ** 2)

    def descend(opt, steps=40):
        p = {"w": jnp.zeros((8,)), "b": jnp.ones((8,)) * 2.0}
        state = opt.init(p)

        @jax.jit
        def step(p, state):
            g = jax.grad(loss_fn)(p)
            u, state = opt.update(g, state, p)
            return optax.apply_updates(p, u), state

        for _ in range(steps):
            p, state = step(p, state)
        return float(loss_fn(p))

    l_ref = descend(agent_optimizer(1e-2, "adam", 40.0))
    l_lowp = descend(agent_optimizer(1e-2, "adam", 40.0, bf16_moments=True))
    assert l_lowp < 0.9 * float(
        jnp.sum((jnp.zeros(8) - 3.0) ** 2) + jnp.sum((jnp.ones(8) * 2) ** 2))
    assert abs(l_ref - l_lowp) < 0.05 * max(l_ref, 1e-3)


def test_bf16_opt_state_checkpoint_roundtrip(tmp_path):
    """Exact resume with bf16 moments: orbax must restore the ScaleByAdamState
    at its stored bfloat16 dtype (a silent f32 upcast would desync the
    restored run from the uninterrupted one)."""
    from visitron_tpu.train.checkpoint import CheckpointManager

    params = {"w": jnp.ones((6, 3)), "b": jnp.zeros((3,))}
    opt = agent_optimizer(1e-3, "adam", 40.0, bf16_moments=True)
    state = opt.init(params)
    g = jax.tree.map(lambda p: jnp.full_like(p, 0.25), params)
    for _ in range(3):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, params, opt_state=state)
    restored = mgr.restore(3, {"params": params, "opt_state": state})
    r_adam = restored["opt_state"][1][0]
    s_adam = state[1][0]
    for got, want in zip(jax.tree.leaves(r_adam), jax.tree.leaves(s_adam)):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
