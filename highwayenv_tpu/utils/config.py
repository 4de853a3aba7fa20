"""Layered dict-config system with nested-override validation.

Same *contract* as the reference (highway_env/utils.py:427-478): when a
config override supplies a nested mapping for a key whose default is also a
mapping, the override must redefine **every** key of that nested default
(partial nested overrides are rejected with a dotted-path error message),
with one carve-out for the multi-agent ``action``/``observation`` blocks,
whose inner ``*_config`` sub-dict counts toward the outer key set.

The implementation is this repo's own: an explicit-stack pre-order walk of
``(path, default_node, override_node)`` frames instead of the reference's
recursive walker + contextvar path tracking.  Only the two error-message
shapes are preserved (they are the observable API):

    ``config.<path> must be a mapping, got <typename>``
    ``config.<path> invalid: missing_keys={...}``
"""

from __future__ import annotations

from typing import Any, Mapping

#: outer keys whose ``<key>_config`` sub-mapping is folded into the
#: override before completeness checking (multi-agent configs nest the real
#: per-agent config one level down; reference utils.py:458-461)
_FOLDED_SUBCONFIG_KEYS = frozenset({"action", "observation"})


def update_config_check(config: dict[str, Any], delta: Mapping[str, Any]) -> None:
    """Validate that every nested mapping in ``delta`` fully redefines the
    corresponding nested mapping in ``config``.  Raises AssertionError with
    a dotted config path on the first violation (reference message shapes).
    """
    stack: list[tuple[str, Mapping[str, Any], Mapping[str, Any]]] = [
        ("config", config, delta)
    ]
    while stack:
        path, defaults, override = stack.pop()
        # nested frames pushed in reverse so deeper levels are visited in
        # sibling dict order; violations at one level all surface before
        # any deeper level of the same subtree is entered
        pending: list[tuple[str, Mapping[str, Any], Mapping[str, Any]]] = []
        for key, default_val in defaults.items():
            if not isinstance(default_val, Mapping) or key not in override:
                continue
            child_path = f"{path}.{key}"
            child = override[key]
            if not isinstance(child, Mapping):
                raise AssertionError(
                    f"{child_path} must be a mapping, "
                    f"got {type(child).__name__}"
                )
            if key in _FOLDED_SUBCONFIG_KEYS:
                sub = child.get(f"{key}_config")
                if isinstance(sub, Mapping):
                    child = {**child, **sub}
            missing_keys = default_val.keys() - child.keys()
            if missing_keys:
                raise AssertionError(
                    f"{child_path} invalid: {missing_keys=}"
                )
            pending.append((child_path, default_val, child))
        stack.extend(reversed(pending))


def update_config(config: dict[str, Any], delta: Mapping[str, Any]) -> dict[str, Any]:
    """Validate ``delta`` against ``config`` (see update_config_check), then
    apply it in place at the top level and return ``config``."""
    update_config_check(config, delta)
    config.update(delta)
    return config
