"""The straight-network fast frame must match the general engine exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht


def _mk(env_id, fast):
    import highwayenv_tpu.envs.highway as hw

    cls = {"highway-v0": hw.HighwayEnv, "highway-fast-v0": hw.HighwayEnvFast}[
        env_id
    ]

    class Sub(cls):
        fast_straight = fast

    return Sub()


@pytest.mark.parametrize("env_id", ["highway-v0", "highway-fast-v0"])
def test_fast_path_matches_general(env_id):
    fast = _mk(env_id, True)
    slow = _mk(env_id, False)
    assert fast._straight is not None
    assert slow._straight is None

    key = jax.random.PRNGKey(0)
    obs_f, sf = fast.reset(key)
    obs_s, ss = slow.reset(key)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), atol=1e-6)

    for t in range(12):
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (), 0, 5)
        obs_f, sf, rf, tf, uf, _ = fast.step(sf, a)
        obs_s, ss, rs, ts_, us, _ = slow.step(ss, a)
        np.testing.assert_allclose(
            np.asarray(sf.vehicles.pos),
            np.asarray(ss.vehicles.pos),
            atol=2e-3,
            err_msg=f"step {t} positions",
        )
        np.testing.assert_array_equal(
            np.asarray(sf.vehicles.lane), np.asarray(ss.vehicles.lane)
        )
        np.testing.assert_array_equal(
            np.asarray(sf.vehicles.target_lane),
            np.asarray(ss.vehicles.target_lane),
        )
        np.testing.assert_array_equal(
            np.asarray(sf.vehicles.crashed), np.asarray(ss.vehicles.crashed)
        )
        assert abs(float(rf) - float(rs)) < 1e-4, t
        assert bool(tf) == bool(ts_)
        np.testing.assert_allclose(
            np.asarray(obs_f), np.asarray(obs_s), atol=1e-3
        )


def test_non_straight_envs_use_general_path():
    for env_id in ["merge-v0", "roundabout-v0", "u-turn-v0", "intersection-v0"]:
        assert ht.make(env_id)._straight is None, env_id
