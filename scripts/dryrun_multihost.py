#!/usr/bin/env python
"""Multi-host dryrun: N REAL processes rendezvous through
`jax.distributed.initialize` and run the framework end-to-end on one
process-spanning mesh — the thing MULTICHIP's single-process virtual mesh
cannot exercise (parallel/distributed.py; reference analog:
stylegan2/train.py:258-277 multi-process NCCL rendezvous).

Per worker (CPU backend, --local-devices virtual devices each):
  1. the CLI search path: run.py --tiny StyleGAN2_ffhq_d over the global
     mesh (implied by the active distributed runtime); process 0 writes
     the full artifact set + ga_state.npz checkpoint,
  2. one trainer phase: tiny StyleGAN2 Trainer on the global mesh, each
     process feeding ITS slice of the global batch
     (distributed.global_batch_from_local), 2 steps incl. a lazy-reg one.

The launcher spawns the workers, waits, and prints ONE JSON verdict line:
  {"ok": true, "processes": 2, "global_devices": 4, ...}

Usage:
  python scripts/dryrun_multihost.py [--nprocs 2] [--local-devices 2]
                                     [--generations 4]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# ------------------------------------------------------------------ worker

def worker(args) -> int:
    # CPU backend with a virtual device count, pinned over the axon
    # plugin's startup override (core/backend.py docstring)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from clip_glass_tpu.parallel import distributed as dist
    dist.initialize(f"localhost:{args.port},{args.nprocs},{args.proc_id}")
    assert jax.process_count() == args.nprocs
    n_global = len(jax.devices())

    # ---- 1. CLI search over the global mesh (mesh implied by active())
    from clip_glass_tpu.cli import main
    out = os.path.join(args.out, "search")
    rc = main(["--config", "StyleGAN2_ffhq_d", "--target", "a red flower",
               "--generations", str(args.generations), "--save-each", "2",
               "--tmp-folder", out, "--tiny", "--pop-size", "8"])
    if rc != 0:
        return rc

    # ---- 2. trainer on the global mesh, per-process local batches
    import numpy as np
    from clip_glass_tpu.models.stylegan2 import model as sg2
    from clip_glass_tpu.parallel import make_mesh
    from clip_glass_tpu.training.trainer import Trainer, TrainerConfig

    mesh = make_mesh()  # 1-D over ALL processes' devices
    global_batch = n_global  # 1 real per device
    tcfg = TrainerConfig(batch_size=global_batch, checkpoint_every=0,
                         g_reg_interval=2, d_reg_interval=2)
    trainer = Trainer(model_cfg=sg2.TINY, cfg=tcfg, mesh=mesh)
    rng = np.random.default_rng(0)  # same stream; each process SLICES its part
    res = sg2.TINY.resolution
    local = global_batch // args.nprocs

    def batches():
        while True:
            full = rng.standard_normal(
                (global_batch, 3, res, res)).astype(np.float32)
            lo = args.proc_id * local
            yield full[lo:lo + local]

    logs = trainer.train(batches(), iterations=2)
    d_loss = float(logs["d_loss"])

    if dist.is_primary():
        import numpy as np
        state = np.load(os.path.join(out, "ga_state.npz"))
        verdict = {
            "ok": True,
            "processes": int(jax.process_count()),
            "global_devices": int(n_global),
            "local_devices": int(jax.local_device_count()),
            "search_gens": int(state["gen"]),
            "pop_shape": list(state["X"].shape),
            "artifacts": sorted(f for f in os.listdir(out)
                                if not f.endswith(".tmp")),
            "trainer_steps": 2,
            "trainer_d_loss": d_loss,
        }
        with open(os.path.join(args.out, "verdict.json"), "w") as f:
            json.dump(verdict, f)
    return 0


# ---------------------------------------------------------------- launcher

def launch(args) -> int:
    port = _free_port()
    out = args.out or tempfile.mkdtemp(prefix="multihost_dryrun_")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          f" --xla_force_host_platform_device_count="
                          f"{args.local_devices}").strip(),
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--proc-id", str(i), "--port", str(port),
         "--nprocs", str(args.nprocs),
         "--local-devices", str(args.local_devices),
         "--generations", str(args.generations), "--out", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(args.nprocs)]
    fail = None
    for i, p in enumerate(procs):
        outp, _ = p.communicate(timeout=args.timeout)
        if p.returncode != 0 and fail is None:
            fail = (i, p.returncode, outp[-2000:])
    if fail is not None:
        print(json.dumps({"ok": False, "proc": fail[0], "rc": fail[1],
                          "tail": fail[2]}))
        return 1
    with open(os.path.join(out, "verdict.json")) as f:
        print(json.dumps(json.load(f)))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--generations", type=int, default=4)
    p.add_argument("--timeout", type=int, default=900)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--worker", action="store_true")
    p.add_argument("--proc-id", type=int, default=0)
    p.add_argument("--port", type=int, default=0)
    args = p.parse_args()
    return worker(args) if args.worker else launch(args)


if __name__ == "__main__":
    sys.exit(main())
