"""Contract tests for the layered config validator (utils/config.py).

Pins the observable API the reference establishes (utils.py:427-478):
full-redefinition rule for nested mapping overrides, dotted-path error
messages, and the action/observation ``*_config`` fold."""

import pytest

from highwayenv_tpu.utils.config import update_config, update_config_check


def _base():
    return {
        "observation": {"type": "Kinematics", "vehicles_count": 5},
        "action": {"type": "DiscreteMetaAction"},
        "duration": 40,
        "screen": {"width": 600, "height": 150},
    }


def test_flat_override_applies():
    cfg = update_config(_base(), {"duration": 10})
    assert cfg["duration"] == 10


def test_full_nested_override_applies():
    cfg = update_config(
        _base(), {"screen": {"width": 300, "height": 75}}
    )
    assert cfg["screen"] == {"width": 300, "height": 75}


def test_partial_nested_override_rejected_with_path():
    with pytest.raises(AssertionError, match=r"config.screen invalid"):
        update_config_check(_base(), {"screen": {"width": 300}})


def test_non_mapping_nested_override_rejected():
    with pytest.raises(
        AssertionError, match=r"config.screen must be a mapping, got int"
    ):
        update_config_check(_base(), {"screen": 3})


def test_multiagent_action_config_fold():
    # multi-agent style: the real per-agent config nests one level down in
    # action_config; its keys must count toward the outer completeness set
    update_config_check(
        _base(),
        {
            "action": {
                "type": "MultiAgentAction",
                "action_config": {"type": "DiscreteMetaAction"},
            }
        },
    )


def test_deep_nesting_checked_recursively():
    base = {"a": {"b": {"c": 1, "d": 2}}}
    with pytest.raises(AssertionError, match=r"config.a.b invalid"):
        update_config_check(base, {"a": {"b": {"c": 9}}})
    update_config_check(base, {"a": {"b": {"c": 9, "d": 8}}})


def test_unknown_keys_pass_through():
    cfg = update_config(_base(), {"brand_new": {"x": 1}})
    assert cfg["brand_new"] == {"x": 1}
