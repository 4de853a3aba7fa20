"""PARITY #6/#11: the batched ``jax.random`` reset path is
distribution-equivalent to the reference's spawn chain.

The host replay (``seeding.py``) proves byte-identical scenes per seed;
the high-throughput jitted reset draws in a different ORDER with the same
distributions.  This test turns that claim into evidence: two-sample
Kolmogorov-Smirnov tests over >=10^4 spawn samples per family comparing
the reference's seeded resets against ``jax.vmap(env._reset)`` on the
marginals that define a scene — NPC speed, longitudinal spacing between
consecutive spawns, and lateral (lane y) placement.

KS with these sample sizes resolves sup-norm differences of ~3%; the
distributions are constructed to be identical (create_random's
U(0.7,0.8)*speed_limit speeds, spacing ~ d0*U(0.9,1.1), uniform lane
choice — vehicle/kinematics.py:50-104), so alpha = 1e-3 two-sided tests
must pass.  Marked slow: steps ~600 reference resets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")
scipy_stats = pytest.importorskip("scipy.stats")

ALPHA = 1e-3
N_REF = 600
N_OURS = 2048


def _ref_samples(env_id, config, n):
    ref = gym.make(env_id, config=config)
    speeds, gaps, ys = [], [], []
    for seed in range(n):
        ref.reset(seed=seed)
        road = ref.unwrapped.road
        vs = [v for v in road.vehicles if v is not ref.unwrapped.vehicle]
        speeds.extend(float(v.speed) for v in vs)
        ys.extend(float(v.position[1]) for v in vs)
        xs = sorted(float(v.position[0]) for v in road.vehicles)
        gaps.extend(np.diff(xs))
    return np.asarray(speeds), np.asarray(gaps), np.asarray(ys)


def _our_samples(env_id, config, n):
    env = ht.make(env_id, config)
    keys = jax.random.split(jax.random.PRNGKey(1234), n)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh = states.vehicles
    active = np.asarray(veh.is_vehicle)
    ego = np.zeros(active.shape[-1], bool)
    for e in env.ego_slots:
        ego[int(e)] = True
    npc = active & ~ego[None, :]
    speeds = np.asarray(veh.speed)[npc]
    ys = np.asarray(veh.pos[..., 1])[npc]
    xs = np.where(active, np.asarray(veh.pos[..., 0]), np.inf)
    xs = np.sort(xs, axis=-1)
    n_act = active.sum(axis=-1)
    gaps = []
    for b in range(xs.shape[0]):
        gaps.extend(np.diff(xs[b, : n_act[b]]))
    return speeds, np.asarray(gaps), ys


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_id,config",
    [
        ("highway-v0", {"lanes_count": 4, "vehicles_count": 20}),
        ("highway-fast-v0", {}),
        ("roundabout-v0", {}),
    ],
)
def test_reset_marginals_match_reference(env_id, config):
    r_speed, r_gap, r_y = _ref_samples(env_id, config, N_REF)
    o_speed, o_gap, o_y = _our_samples(env_id, config, N_OURS)
    assert len(r_speed) >= 2000 and len(o_speed) >= 8000
    for name, a, b in [
        ("speed", r_speed, o_speed),
        ("spacing", r_gap, o_gap),
        ("lateral", r_y, o_y),
    ]:
        stat, p = scipy_stats.ks_2samp(a, b)
        assert p > ALPHA, (
            f"{env_id} {name}: KS D={stat:.4f} p={p:.2e} "
            f"(ref n={len(a)}, ours n={len(b)}, "
            f"ref mean={a.mean():.3f} ours mean={b.mean():.3f})"
        )
