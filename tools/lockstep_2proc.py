#!/usr/bin/env python
"""Two-process lockstep serving exercise (CPU, jax.distributed).

The lockstep protocol (parallel/serving.py) exists for multi-host
serving: every host must dispatch the same sequence of collective steps
or the mesh deadlocks.  The in-repo unit test runs with
``process_count()==1`` where the consensus allgather is trivially
unanimous; THIS script runs the real thing — two OS processes joined by
``jax.distributed.initialize``, each driving a lockstep
:class:`InferenceEngine` with **unequal request streams** (process 0
submits 4x the requests of process 1), shutting down only by unanimous
consensus at deterministic step indices.

Checks (each process):
  * every submitted future resolves with correct shape,
  * the engine exits (consensus reached — no deadlock, no straggler),
  * both processes report the SAME total step count (the protocol's
    core invariant), verified via a final allgather.

Run:  python tools/lockstep_2proc.py          (parent: spawns 2 children)
"""

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PORT = int(os.environ.get("DLMCQ_LOCKSTEP_PORT", "12397"))


def child(pid: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils

    import flax.linen as nn
    from dlmc_quant_tpu.parallel.serving import InferenceEngine

    assert jax.process_count() == 2

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, qmode: str = "fp"):
            return nn.Dense(10)(x.reshape(x.shape[0], -1))

    model = Tiny()
    x0 = np.zeros((2, 8, 8, 3), np.float32)
    v = model.init(jax.random.PRNGKey(0), x0)

    eng = InferenceEngine(model, v, mesh=None, batch_size=8, qmode="fp",
                          tick_ms=5.0, consensus_every=4)
    assert eng.lockstep, "process_count()==2 must auto-enable lockstep"
    eng.warmup((8, 8, 3))
    eng.start()

    n_req = 16 if pid == 0 else 4          # unequal streams
    futs = [eng.submit(np.random.default_rng(pid * 100 + i)
                       .random((2, 8, 8, 3), np.float32).astype(np.float32))
            for i in range(n_req)]
    if pid == 1:
        time.sleep(0.05)                   # extra desync
    for f in futs:
        out = f.result(timeout=60)
        assert out.shape == (2, 10), out.shape
    eng.stop(timeout=60)
    assert not eng._thread.is_alive(), "dispatcher failed to exit"

    steps = multihost_utils.process_allgather(np.asarray([eng.steps]))
    assert steps[0] == steps[1], f"step counts diverged: {steps}"
    print(f"proc {pid}: {n_req} requests resolved, steps={int(eng.steps)}, "
          f"consensus shutdown ok", flush=True)


def main():
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--child", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- proc {i} (rc={p.returncode}) ---\n{tail}")
        ok = ok and p.returncode == 0
    print("LOCKSTEP 2-PROC:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
