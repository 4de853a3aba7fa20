"""IntersectionEnv._reset_batched: the pallas-warm-up batched reset must
match vmap(_reset) (the XLA warm-up) up to the kernel's documented trig
precision (PARITY #17) — spawns, key schedule, challenger/ego phases and
the regulation ticks inside the warm-up are all exercised."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht


@pytest.mark.slow  # interpret-mode 45-frame warm-up kernel
def test_intersection_batched_reset_matches_vmapped():
    env = ht.make("intersection-v0")
    assert env._general is not None  # regulated kernel is default (round 5)
    P = 8
    keys = jax.random.split(jax.random.PRNGKey(7), P)

    obs_ref, st_ref = jax.jit(jax.vmap(env._reset))(keys)

    # force the batched path on CPU (interpret-mode kernel)
    orig = env._use_pallas_general
    env._use_pallas_general = lambda batch: True
    try:
        obs_b, st_b = jax.jit(env._reset_batched)(keys)
    finally:
        env._use_pallas_general = orig

    va, vb = st_ref.vehicles, st_b.vehicles
    np.testing.assert_array_equal(np.asarray(va.kind), np.asarray(vb.kind))
    np.testing.assert_array_equal(
        np.asarray(va.route_len), np.asarray(vb.route_len)
    )
    # warm-up runs 45 frames of feedback through the kernel's cephes trig:
    # positions drift at precision scale, not semantics
    np.testing.assert_allclose(
        np.asarray(va.pos), np.asarray(vb.pos), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(va.speed), np.asarray(vb.speed), atol=0.05
    )
    lane_match = (
        np.asarray(va.lane) == np.asarray(vb.lane)
    ).mean()
    assert lane_match > 0.98, lane_match
    np.testing.assert_allclose(
        np.asarray(obs_ref), np.asarray(obs_b), atol=0.05
    )
    # keys carried into the state must be identical (same split schedule)
    np.testing.assert_array_equal(
        np.asarray(st_ref.key), np.asarray(st_b.key)
    )
