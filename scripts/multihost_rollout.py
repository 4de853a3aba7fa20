"""Multi-host sharded rollout over jax.distributed (DCN path).

Each process initializes `jax.distributed`, contributes its local (virtual
CPU) devices to the global mesh, and the env batch shards over ALL
processes' devices — the same `parallel/sharding.py` code path that spans a
TPU pod slice (ICI within a host, DCN across hosts; SURVEY.md section 5.8).

Run standalone (spawns its own workers):
    python scripts/multihost_rollout.py [n_processes] [local_devices]

or as a worker (driven by the test / by itself):
    python scripts/multihost_rollout.py --worker <rank> <n_processes> <port> <local_devices>

Prints one line per process: "rank=R ok global_devices=D reward=X" — the
reward is the cross-host psum-reduced metric, identical on every rank.
"""

from __future__ import annotations

import os
import subprocess
import sys


def worker(rank: int, n_processes: int, port: int, local_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_processes,
        process_id=rank,
    )
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import highwayenv_tpu as ht
    from highwayenv_tpu.parallel.sharding import (
        make_mesh,
        sharded_rollout_fn,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()  # global: n_processes * local_devices
    assert len(devices) == n_processes * local_devices, devices
    mesh = make_mesh(devices)

    env = ht.make("highway-fast-v0", {"vehicles_count": 5, "lanes_count": 2})
    B = 2 * len(devices)

    # host-local reset: each process builds its shard's rows, then the
    # global array is assembled from per-host shards (no cross-host state)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    sharding = NamedSharding(mesh, P("env"))

    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    import numpy as np

    states = jax.tree.map(lambda x: to_global(np.asarray(x)), states)

    rollout = sharded_rollout_fn(env, mesh, horizon=2)
    states, metrics = rollout(states, jax.random.PRNGKey(1))
    reward = float(metrics["mean_reward"])
    print(
        f"rank={rank} ok global_devices={len(devices)} reward={reward:.6f}",
        flush=True,
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]),
        )
        return 0
    n_processes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    local_devices = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    port = 12765
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__), "--worker",
                str(rank), str(n_processes), str(port), str(local_devices),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(n_processes)
    ]
    ok = True
    rewards = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        sys.stdout.write(out)
        ok &= p.returncode == 0 and " ok " in out
        for line in out.splitlines():
            if line.startswith("rank="):
                rewards.append(line.split("reward=")[1])
    # the psum-reduced metric must agree bitwise across hosts
    ok &= len(set(rewards)) == 1 and len(rewards) == n_processes
    print("MULTIHOST", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
