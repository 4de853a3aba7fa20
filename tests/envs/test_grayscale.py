"""Jitted GrayscaleObservation: in-state frame stack, rasterized frames."""

import numpy as np
import jax
import jax.numpy as jnp

import highwayenv_tpu as ht

CFG = {
    "observation": {
        "type": "GrayscaleObservation",
        "observation_shape": (128, 64),
        "stack_size": 4,
        "weights": [0.2989, 0.5870, 0.1140],
        "scaling": 1.75,
    }
}


def test_grayscale_stack_semantics():
    env = ht.make("highway-fast-v0", CFG)
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 128, 64) and obs.dtype == jnp.uint8
    # reference: stack starts zeroed, reset pushes one frame
    assert np.asarray(obs[:3]).sum() == 0
    assert np.asarray(obs[3]).sum() > 0

    step = jax.jit(env.step)
    o1, state, *_ = step(state, jnp.int32(3))
    o2, state, *_ = step(state, jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(o2[2]), np.asarray(o1[3]))

    frame = np.asarray(o2[3])
    assert frame.max() > 200  # white lane markings
    assert frame.min() < 100  # grey road surface (reference fills GREY=99)
    # ego (green) and traffic (yellow) gray levels present
    w = np.array([0.2989, 0.5870, 0.1140])
    ego_gray = int(np.dot((50, 200, 0), w))
    # IDM NPCs are BLUE in the reference palette (vehicle/graphics.py:243)
    npc_gray = int(np.dot((100, 200, 255), w))
    vals = set(np.unique(frame))
    assert ego_gray in vals and npc_gray in vals


def test_grayscale_space_and_vmap():
    env = ht.make("highway-fast-v0", CFG)
    assert env.observation_space.shape == (4, 128, 64)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    obs, states = jax.vmap(env._reset)(keys)
    assert obs.shape == (3, 4, 128, 64)
    obs2, states, r, te, tr, _ = jax.vmap(env.step_autoreset)(
        states, jnp.ones((3,), jnp.int32)
    )
    assert obs2.shape == (3, 4, 128, 64)
    assert np.isfinite(np.asarray(r)).all()
