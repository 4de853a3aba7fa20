"""highwayenv_tpu — a TPU-native vectorized driving-environment engine.

A from-scratch JAX/XLA rebuild of the capabilities of
Farama-Foundation/HighwayEnv: fixed-shape SoA scene state, fused jit/vmap
transition kernels (IDM+MOBIL traffic, kinematic bicycle dynamics, masked
pairwise collisions), compiled road-network geometry tables, and env batches
that shard across TPU meshes.

Registry ids mirror the reference (highway_env/__init__.py:22-187).
"""

from __future__ import annotations

__version__ = "0.1.0"

_REGISTRY: dict[str, tuple] = {}


def register(env_id: str, cls, kwargs: dict | None = None):
    _REGISTRY[env_id] = (cls, kwargs or {})


def make(env_id: str, config: dict | None = None):
    """Instantiate a registered environment (functional core).

    Returns an env object with pure jittable ``reset(key)`` and
    ``step(state, action)`` methods; see envs/base.py.
    """
    if env_id not in _REGISTRY:
        raise KeyError(
            f"Unknown env id {env_id!r}; known: {sorted(_REGISTRY)}"
        )
    cls, base_kwargs = _REGISTRY[env_id]
    base_config = dict(base_kwargs.get("config", {}))
    if config:
        base_config.update(config)
    return cls(config=base_config or None)


def make_vec(env_id: str, num_envs: int, config: dict | None = None, **kw):
    """Gymnasium VectorEnv over the batched JAX core (vector_env.py):
    the whole batch steps as ONE jitted program on the accelerator."""
    from highwayenv_tpu.vector_env import GymVectorEnv

    return GymVectorEnv(env_id, num_envs, config=config, **kw)


def registered_ids():
    return sorted(_REGISTRY)


def make_gym(env_id: str, config: dict | None = None, render_mode=None):
    """Stateful Gymnasium-compatible env (see gym_env.GymEnv)."""
    from highwayenv_tpu.gym_env import GymEnv

    return GymEnv(env_id, config, render_mode)


def register_gymnasium_envs(namespace: str = "highwayenv_tpu") -> None:
    from highwayenv_tpu.gym_env import register_gymnasium_envs as _reg

    _reg(namespace)


def _register_all():
    from highwayenv_tpu.envs.exit import ExitEnv
    from highwayenv_tpu.envs.highway import HighwayEnv, HighwayEnvFast
    from highwayenv_tpu.envs.merge import MergeEnv
    from highwayenv_tpu.envs.merge_generic import MergeGenericEnv
    from highwayenv_tpu.envs.roundabout_generic import RoundaboutGenericEnv
    from highwayenv_tpu.envs.two_way import TwoWayEnv
    from highwayenv_tpu.envs.parking import (
        ParkingEnv,
        ParkingEnvActionRepeat,
        ParkingEnvParkedVehicles,
    )
    from highwayenv_tpu.envs.intersection import (
        ContinuousIntersectionEnv,
        IntersectionEnv,
        MultiAgentIntersectionEnv,
    )
    from highwayenv_tpu.envs.lane_keeping import LaneKeepingEnv
    from highwayenv_tpu.envs.racetrack import (
        RacetrackEnv,
        RacetrackEnvLarge,
        RacetrackEnvOval,
    )
    from highwayenv_tpu.envs.roundabout import RoundaboutEnv
    from highwayenv_tpu.envs.u_turn import UTurnEnv

    # "-v1/-v2 connected-lane" variants flip one config flag, exactly like
    # the reference's ConnectedLaneNeighboursMixin (envs/common/abstract.py:26-37)
    CONNECTED = {"config": {"neighbour_vehicles_connected_lanes": True}}

    register("highway-v0", HighwayEnv)
    register("highway-fast-v0", HighwayEnvFast)
    register("merge-v0", MergeEnv)
    register("merge-v1", MergeEnv, CONNECTED)
    register("merge-generic-v0", MergeGenericEnv)
    register("merge-generic-v1", MergeGenericEnv, CONNECTED)
    register("two-way-v0", TwoWayEnv)
    register("u-turn-v0", UTurnEnv)
    register("u-turn-v1", UTurnEnv, CONNECTED)
    register("exit-v0", ExitEnv)
    register("exit-v1", ExitEnv, CONNECTED)
    register("roundabout-v0", RoundaboutEnv)
    register("roundabout-v1", RoundaboutEnv, CONNECTED)
    register("roundabout-generic-v0", RoundaboutGenericEnv)
    register("roundabout-generic-v1", RoundaboutGenericEnv, CONNECTED)
    register("parking-v0", ParkingEnv)
    register("parking-ActionRepeat-v0", ParkingEnvActionRepeat)
    register("parking-parked-v0", ParkingEnvParkedVehicles)
    register("racetrack-v0", RacetrackEnv)
    register("racetrack-v1", RacetrackEnv, CONNECTED)
    register("racetrack-large-v0", RacetrackEnvLarge)
    register("racetrack-large-v1", RacetrackEnvLarge, CONNECTED)
    register("racetrack-oval-v0", RacetrackEnvOval)
    register("racetrack-oval-v1", RacetrackEnvOval, CONNECTED)
    register("intersection-v0", IntersectionEnv)
    register("intersection-v1", ContinuousIntersectionEnv)
    register("intersection-v2", IntersectionEnv, CONNECTED)
    register("intersection-multi-agent-v0", MultiAgentIntersectionEnv)
    register("intersection-multi-agent-v1", MultiAgentIntersectionEnv)
    register("intersection-multi-agent-v2", MultiAgentIntersectionEnv, CONNECTED)
    register("lane-keeping-v0", LaneKeepingEnv)


_register_all()
