"""Observation / action type factories dispatched on config["type"].

Mirrors the reference factory surface (envs/common/observation.py:772-795,
envs/common/action.py:336-347) so scenario configs are drop-in compatible.
"""

from __future__ import annotations

from highwayenv_tpu.actions.continuous import ContinuousAction, DiscreteAction
from highwayenv_tpu.actions.discrete_meta import DiscreteMetaAction
from highwayenv_tpu.observations.exit_obs import ExitObservation
from highwayenv_tpu.observations.kinematics import KinematicsObservation
from highwayenv_tpu.observations.kinematics_goal import KinematicsGoalObservation
from highwayenv_tpu.observations.occupancy_grid import OccupancyGridObservation
from highwayenv_tpu.observations.ttc import TimeToCollisionObservation


def observation_factory(env, config: dict):
    kwargs = {k: v for k, v in config.items() if k != "type"}
    if config["type"] == "Kinematics":
        return KinematicsObservation(
            reset_edge_lanes=getattr(env, "obs_edge_lanes", None), **kwargs
        )
    if config["type"] == "TimeToCollision":
        return TimeToCollisionObservation(env, **kwargs)
    if config["type"] == "ExitObservation":
        return ExitObservation(
            reset_edge_lanes=getattr(env, "obs_edge_lanes", None), **kwargs
        )
    if config["type"] == "KinematicsGoal":
        return KinematicsGoalObservation(env, **kwargs)
    if config["type"] == "OccupancyGrid":
        return OccupancyGridObservation(**kwargs)
    if config["type"] == "LidarObservation":
        from highwayenv_tpu.observations.lidar import LidarObservation

        return LidarObservation(**kwargs)
    if config["type"] == "GrayscaleObservation":
        from highwayenv_tpu.observations.grayscale import GrayscaleObservation

        return GrayscaleObservation(env, **kwargs)
    if config["type"] == "AttributesObservation":
        from highwayenv_tpu.observations.attributes import AttributesObservation

        return AttributesObservation(env, **kwargs)
    if config["type"] == "MultiAgentObservation":
        from highwayenv_tpu.observations.multi import MultiAgentObservation

        return MultiAgentObservation(env, **kwargs)
    if config["type"] == "TupleObservation":
        from highwayenv_tpu.observations.multi import TupleObservation

        return TupleObservation(env, **kwargs)
    raise ValueError(f"Unknown observation type: {config['type']}")


def action_factory(config: dict, env=None):
    kwargs = {k: v for k, v in config.items() if k != "type"}
    if config["type"] == "DiscreteMetaAction":
        return DiscreteMetaAction(**kwargs)
    if config["type"] == "ContinuousAction":
        return ContinuousAction(**kwargs)
    if config["type"] == "DiscreteAction":
        return DiscreteAction(**kwargs)
    if config["type"] == "MultiAgentAction":
        from highwayenv_tpu.actions.multi_agent import MultiAgentAction

        return MultiAgentAction(env, **kwargs)
    raise ValueError(f"Unknown action type: {config['type']}")
