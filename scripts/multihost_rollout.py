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

    import numpy as np

    def to_global(x):
        # every process computed the full global batch host-side; each
        # device's shard is sliced by GLOBAL index, so the assembled array
        # is identical under any process/device layout (passing the
        # global-shaped array to make_array_from_process_local_data
        # instead mis-slices it as process-local rows — the round-4 bug)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    states = jax.tree.map(to_global, states)

    if not os.environ.get("HT_HASH_RESET"):
        rollout = sharded_rollout_fn(env, mesh, horizon=2)
        states, metrics = rollout(states, jax.random.PRNGKey(1))
    else:
        metrics = {"mean_reward": 0.0}
    reward = float(metrics["mean_reward"])

    # bitwise state invariance across process layouts: hash the full final
    # integer state (gathered to every host) — the same global batch run
    # under a different process/device split must produce the identical
    # digest (per-env dynamics are independent of the sharding layout)
    import hashlib

    from jax.experimental import multihost_utils

    h = hashlib.sha256()
    for f in ("lane", "target_lane", "crashed", "speed_index", "kind"):
        arr = multihost_utils.process_allgather(
            getattr(states.vehicles, f), tiled=True
        )
        h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    # float positions are per-env math, also layout-invariant; fold the
    # exact bit pattern in rather than a lossy comparison
    pos = multihost_utils.process_allgather(states.vehicles.pos, tiled=True)
    h.update(np.ascontiguousarray(np.asarray(pos, np.float32)).tobytes())
    digest = h.hexdigest()[:16]
    print(
        f"rank={rank} ok global_devices={len(devices)} reward={reward:.6f} "
        f"statehash={digest}",
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

    def run_layout(n_proc: int, local: int, port: int):
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    str(rank), str(n_proc), str(port), str(local),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for rank in range(n_proc)
        ]
        ok = True
        rewards, hashes = [], []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            sys.stdout.write(out)
            ok &= p.returncode == 0 and " ok " in out
            for line in out.splitlines():
                if line.startswith("rank="):
                    rewards.append(
                        line.split("reward=")[1].split()[0]
                    )
                    hashes.append(line.split("statehash=")[1].strip())
        # the psum-reduced metric must agree bitwise across hosts
        ok &= len(set(rewards)) == 1 and len(rewards) == n_proc
        ok &= len(set(hashes)) == 1 and len(hashes) == n_proc
        return ok, rewards[0] if rewards else None, hashes[0] if hashes else None

    ok, reward_mp, hash_mp = run_layout(n_processes, local_devices, 12765)
    # DCN-vs-ICI invariance: the SAME global batch on a single process with
    # all devices must produce a bitwise-identical final state and metric
    total = n_processes * local_devices
    ok1, reward_sp, hash_sp = run_layout(1, total, 12767)
    ok &= ok1
    ok &= reward_mp == reward_sp
    ok &= hash_mp == hash_sp
    print(
        f"layouts: {n_processes}x{local_devices} hash={hash_mp} "
        f"vs 1x{total} hash={hash_sp}"
    )
    print("MULTIHOST", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
