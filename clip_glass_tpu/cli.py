"""CLI driver — the reference `run.py` contract on the TPU-native engine.

Reference behavior mirrored (reference run.py):
- flags --config --target --generations --save-each --tmp-folder (--device is
  accepted for CLI compatibility; the backend comes from JAX) (run.py:15-24)
- periodic artifact dumps `genetic-it-<N>.<jpg|txt>` every save-each
  generations, final dump `genetic-it-final.*`, GA populations sorted by
  fitness (run.py:29-51)
- `genetic_result` pickle of {X, F, G, CV} (run.py:79-84)
- Pareto scatter `F.jpg` for two-objective runs (run.py:86-89)
- `ls_result` latent dump (run.py:92-101; npz of decoded latents here)
- pseudo-weights/ASF decision -> `output.<jpg|txt>` (run.py:103-125)

TPU-native additions: --pop-size/--seed overrides, --weights (incl.
`random:<seed>` checkpoint-free mode), --resume (bit-exact search resume from
the ga_state.npz checkpoint), --mesh to shard the population across devices.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clip-glass-tpu")
    p.add_argument("--device", type=str, default="tpu",
                   help="accepted for reference-CLI parity; backend is JAX's")
    p.add_argument("--config", type=str, default="DeepMindBigGAN512")
    p.add_argument("--generations", type=int, default=500)
    p.add_argument("--save-each", type=int, default=50)
    p.add_argument("--tmp-folder", type=str, default="./tmp")
    p.add_argument("--target", type=str, action="append", default=None,
                   help="search target (text prompt for txt2img, image path "
                        "for img2txt). May be given MULTIPLE times: K targets "
                        "run as K independent searches batched into one "
                        "compiled program (evolve/batched.py), artifacts under "
                        "<tmp-folder>/search-<i>/. Default: 'a wolf at night "
                        "with the moon in the background' (reference run.py:22)")
    p.add_argument("--pop-size", type=int, default=None)
    p.add_argument("--eval-microbatch", type=int, default=None,
                   help="evaluate the population in on-device chunks of this "
                        "size (lax.map): decouples pop size from HBM, like "
                        "the reference's minibatch loops")
    p.add_argument("--search-microbatch", type=int, default=None,
                   help="with multiple --target: evaluate the batched "
                        "searches in on-device chunks of this many searches "
                        "(decouples the tenant count from HBM)")
    p.add_argument("--serve", type=str, default=None, metavar="FILE",
                   help="serve mode: stream targets (one per line) from FILE "
                        "('-' = stdin) through a resident continuous-batching "
                        "server (serving.SearchServer, DESIGN.md §12). "
                        "--generations is the per-request budget (rounded up "
                        "to a multiple of --save-each, the dispatch chunk); "
                        "artifacts land under <tmp-folder>/request-<ticket>/ "
                        "as each request completes. --target is used only as "
                        "the idle-slot placeholder (pass an image path for "
                        "img2txt configs)")
    p.add_argument("--slots", type=int, default=4,
                   help="serve mode: resident search slots (requests beyond "
                        "this queue; finished slots are refilled without "
                        "recompiling)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quantize", type=str, default="", choices=["", "int8"],
                   help="int8: run the compute-heavy frozen-model convs on "
                        "the MXU's 2x-rate int8 path (scales calibrated at "
                        "init; approximate fitness, ops/quant.py). Artifact "
                        "rendering stays full-precision")
    p.add_argument("--weights", type=str, default=None,
                   help="override config weights; 'random:<seed>' for random init")
    p.add_argument("--clip-weights", type=str, default=None,
                   help="path to a CLIP ViT-B/32 checkpoint (.pt or converted "
                        ".npz), or 'random:<seed>'; default: "
                        "./weights/clip/ViT-B-32.npz if present (the "
                        "scripts/download_weights.sh location), else random:0")
    p.add_argument("--resume", action="store_true",
                   help="resume from <tmp-folder>/ga_state.npz")
    p.add_argument("--mesh", action="store_true",
                   help="shard the population across all visible devices")
    p.add_argument("--distributed", type=str, default=None, metavar="SPEC",
                   help="multi-host: initialize jax.distributed before the "
                        "backend starts. 'auto' = cluster auto-detection "
                        "(TPU pod metadata / GKE / SLURM); "
                        "'<host:port>,<num_processes>,<process_id>' = "
                        "explicit rendezvous (run the same command on every "
                        "host with its own process_id — the analog of the "
                        "reference trainer's MASTER_ADDR/PORT + rank, "
                        "train.py:258-277). Implies --mesh: the population "
                        "shards over the GLOBAL device list; process 0 "
                        "writes the artifacts. Env CGT_DISTRIBUTED is the "
                        "flagless equivalent")
    p.add_argument("--verbose", action="store_true", default=True)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model variants (smoke tests / CI; random weights)")
    p.add_argument("--profile", type=str, default="",
                   help="write a jax.profiler device trace to this directory")
    return p


def _tinyfy(config):
    """Shrink a config to the TINY model variants (CPU-runnable smoke mode)."""
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.stylegan2 import model as sg2
    from clip_glass_tpu.models.biggan import model as bg
    from clip_glass_tpu.models.gpt2 import model as g2

    if config.model == "stylegan2":
        return (config.replace(dim_z=32, n_var=32, weights="random:0"),
                clip_model.TINY, sg2.TINY)
    if config.model == "biggan":
        return (config.replace(dim_z=16, num_classes=10, n_var=26,
                               resolution=8, weights="random:0"),
                clip_model.TINY, bg.TINY)
    return (config.replace(dim_z=6, n_var=6, max_tokens_len=5,
                           weights="random:0"),
            clip_model.TINY, g2.TINY)


def decode_latents_npz(config, X: np.ndarray):
    """ls_result content (reference run.py:92-101 saves the latent module's
    state dict; here: the decoded latent arrays)."""
    import jax.numpy as jnp
    from clip_glass_tpu.fitness import latent as L
    Xj = jnp.asarray(X)
    if config.latent == "biggan":
        z, cv = L.decode_biggan(Xj, config.dim_z)
        return {"z": np.asarray(z), "class_labels": np.asarray(cv)}
    if config.latent == "stylegan2":
        return {"z": np.asarray(Xj)}
    return {"z": np.asarray(L.decode_gpt2(Xj)[0])}


def _final_artifacts(problem, config, res, folder, gen_fn):
    """Per-search result artifacts (reference run.py:79-125): genetic_result
    pickle, Pareto scatter F.jpg (2-obj), ls_result latents, decision ->
    output.<jpg|txt>."""
    import jax
    from clip_glass_tpu.evolve.decision import pick
    from clip_glass_tpu.evolve.nds import non_dominated_rank
    from clip_glass_tpu.utils.plotting import save_scatter

    ext = "jpg" if config.task == "txt2img" else "txt"
    if config.n_obj == 2:
        rank = np.asarray(non_dominated_rank(jax.numpy.asarray(res.pop_F)))
        opt = rank == 0
        res_X, res_F = res.pop_X[opt], res.pop_F[opt]
    else:
        best = res.pop_F[:, 0].argmin()
        res_X, res_F = res.pop_X[best], res.pop_F[best]

    with open(os.path.join(folder, "genetic_result"), "wb") as f:
        pickle.dump(dict(X=res_X, F=res_F, G=res.G, CV=res.CV), f)

    if config.n_obj == 2:
        save_scatter(res_F, os.path.join(folder, "F.jpg"),
                     labels=("similarity", "discriminator"))

    if config.n_obj == 1:
        pop_sorted = res.pop_X[np.argsort(res.pop_F[:, 0])]
        np.savez(os.path.join(folder, "ls_result"),
                 **decode_latents_npz(config, pop_sorted))
        X_best = np.atleast_2d(res_X)
    else:
        np.savez(os.path.join(folder, "ls_result"),
                 **decode_latents_npz(config, res.pop_X))
        idx = pick(res_F, (0, 1))
        X_best = np.atleast_2d(np.atleast_2d(res_X)[idx])

    # Render the decision through the WARM pop-sized executable (gen_fn is
    # compiled by the final dump callback): an unjitted batch-k generate
    # would eagerly re-dispatch the whole synthesis op-by-op over the
    # tunnel — measured as most of the final-artifacts phase (~10-20 s of
    # the 200-gen CLI wallclock). Rows are padded by repetition and the
    # pad sliced off; reference behavior unchanged (run.py:115-125).
    k = X_best.shape[0]  # always >= 1 (np.atleast_2d of a decision row)
    if k <= config.pop_size:
        pad = np.repeat(X_best[-1:], config.pop_size - k, axis=0)
        generated = gen_fn(jax.numpy.asarray(
            np.concatenate([X_best, pad], axis=0)),
            problem.generator.bundle)[:k]
    else:
        generated = problem.generator.generate(jax.numpy.asarray(X_best))
    problem.generator.save(generated, os.path.join(folder, f"output.{ext}"))


def _serve_mode(problem, config, args) -> int:
    """CLI front of serving.SearchServer: a reader thread streams targets
    from a file (or stdin) into the queue while the main thread pumps the
    resident slots; each completed request gets the full reference
    artifact set (run.py:79-125) under request-<ticket>/. Artifact writing
    (device pulls + JPEG encode) runs on a one-worker saver thread so
    harvested-slot I/O overlaps the next dispatched chunk."""
    import sys
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax
    from clip_glass_tpu.serving import SearchServer

    # Open the serve source in the MAIN thread: a bad --serve path fails
    # fast with a nonzero exit instead of dying inside the reader thread
    # while the CLI exits 0 having served nothing.
    src = sys.stdin if args.serve == "-" else open(args.serve)

    gen_fn = jax.jit(lambda X, ctx: problem.generator.generate(X, ctx))
    mesh = None
    if args.mesh:
        # shard the slot axis over the devices (serving.py scale-out):
        # whole searches per device group, zero steady-state collectives
        from clip_glass_tpu.parallel import make_mesh
        mesh = make_mesh()
    server = SearchServer(problem, n_slots=args.slots, chunk=args.save_each,
                          key=jax.random.PRNGKey(config.seed),
                          search_microbatch=args.search_microbatch,
                          mesh=mesh)
    eof = threading.Event()

    def reader():
        try:
            for line in src:
                t = line.strip()
                if not t:
                    continue
                ticket = server.submit(t, n_gen=config.generations)
                print(f"[serve] queued #{ticket}: {t!r}", flush=True)
        finally:
            if src is not sys.stdin:
                src.close()
            eof.set()

    def _write_artifacts(ticket, res):
        folder = os.path.join(config.tmp_folder, f"request-{ticket:04d}")
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "target.txt"), "w") as fh:
            fh.write(server.meta.get(ticket, ""))
        _final_artifacts(problem, config, res, folder, gen_fn)
        if args.verbose:
            print(f"[serve] done #{ticket}: "
                  f"best F={float(np.min(res.pop_F)):+.4f} -> {folder}",
                  flush=True)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    saver = ThreadPoolExecutor(max_workers=1)
    pending = {}          # ticket -> future (keys also dedup submissions)
    unchecked = set()     # tickets whose finished future we haven't surfaced
    while True:
        worked = server.tick()
        for ticket in sorted(set(server.results) - set(pending)):
            pending[ticket] = saver.submit(
                _write_artifacts, ticket, server.results[ticket])
            unchecked.add(ticket)
        # Fail fast: a persistently failing artifact writer (bad tmp
        # folder, full disk) aborts the serve now, not after the whole
        # request stream drains.
        for ticket in [t for t in unchecked if pending[t].done()]:
            unchecked.discard(ticket)
            pending[ticket].result()   # re-raises a writer exception
        if not worked:
            if eof.is_set() and not server.pending() and not server.active():
                break
            time.sleep(0.05)
    th.join()
    for fut in pending.values():   # surface any artifact-write error
        fut.result()
    saver.shutdown()
    s = server.stats
    if args.verbose:
        print(f"[serve] {s.completed} requests in {s.ticks} dispatches, "
              f"slot occupancy {s.occupancy:.0%}")
    return 0


def main(argv=None) -> int:
    import time
    t0 = time.perf_counter()
    phases = {}  # wallclock breakdown (printed when --verbose)

    args = build_parser().parse_args(argv)
    targets = args.target or ["a wolf at night with the moon in the background"]

    import jax
    from clip_glass_tpu.core.backend import (enable_compile_cache,
                                             pin_platform_from_env,
                                             tune_tpu_compiler)
    pin_platform_from_env()  # JAX_PLATFORMS=cpu etc. wins over plugin default
    tune_tpu_compiler()  # scoped-VMEM default; before the first backend touch
    from clip_glass_tpu.parallel import distributed as dist
    dist.initialize(args.distributed)  # before the first backend touch
    if dist.active() and not args.mesh:
        args.mesh = True  # a process-spanning run only makes sense sharded
        if dist.is_primary():
            print(f"[distributed] {jax.process_count()} processes / "
                  f"{len(jax.devices())} devices; --mesh implied")
    enable_compile_cache()  # repeated searches skip the big XLA compiles
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.core.checkpoint import load_state, save_state
    from clip_glass_tpu.evolve.algorithm import minimize
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.parallel import make_mesh, shard_state

    phases["imports"] = time.perf_counter() - t0

    config = get_config(args.config).replace(
        target=targets[0], tmp_folder=args.tmp_folder, seed=args.seed,
        generations=args.generations, save_each=args.save_each)
    if args.pop_size:
        config = config.replace(pop_size=args.pop_size)
    if args.eval_microbatch:
        config = config.replace(eval_microbatch=args.eval_microbatch)
    if args.weights:
        config = config.replace(weights=args.weights)
    if args.quantize:
        config = config.replace(quantize=args.quantize)

    clip_cfg = model_cfg = None
    if args.tiny:
        config, clip_cfg, model_cfg = _tinyfy(config)

    os.makedirs(config.tmp_folder, exist_ok=True)
    clip_weights = args.clip_weights
    if clip_weights is None:
        default_clip = "./weights/clip/ViT-B-32.npz"
        clip_weights = (default_clip
                        if os.path.exists(default_clip) and not args.tiny
                        else "random:0")
    if args.serve and args.serve != "-" and not os.path.exists(args.serve):
        build_parser().error(f"--serve file not found: {args.serve}")
    if args.serve and args.resume:
        build_parser().error(
            "--serve does not support --resume (server state is resident "
            "and per-request; re-submit unfinished targets instead)")
    if args.serve and len(targets) > 1:
        print("[serve] note: only the first --target is used (as the "
              "idle-slot placeholder); serve requests come from the "
              f"--serve stream, ignoring {len(targets) - 1} extra target(s)")

    problem = GenerationProblem(config, clip_weights=clip_weights,
                                clip_cfg=clip_cfg, model_cfg=model_cfg)
    if args.serve:
        if dist.active():
            build_parser().error(
                "--serve is single-host: the server's slot axis shards over "
                "local devices; run one server per host instead")
        return _serve_mode(problem, config, args)
    n_search = len(targets)
    if n_search > 1:
        # K searches (one per --target) batched into ONE compiled program
        from clip_glass_tpu.evolve.batched import (make_batched,
                                                   minimize_batched)
        algorithm = make_batched(problem, targets,
                                 search_microbatch=args.search_microbatch)
        folders = [os.path.join(config.tmp_folder, f"search-{i:02d}")
                   for i in range(n_search)]
        for f, t in zip(folders, targets):
            os.makedirs(f, exist_ok=True)
            with open(os.path.join(f, "target.txt"), "w") as fh:
                fh.write(t)
    else:
        algorithm = problem.make_algorithm()
        folders = [config.tmp_folder]
    if dist.active() and (algorithm.base.host_eval if n_search > 1
                          else algorithm.host_eval):
        build_parser().error(
            "img2txt's host-staged BPE round trip reads the population on "
            "the host each generation and is single-host only; multi-host "
            "meshes support the pure-jit configs (txt2img)")
    ext = "jpg" if config.task == "txt2img" else "txt"

    phases["setup"] = time.perf_counter() - t0 - sum(phases.values())

    mesh = make_mesh() if args.mesh else None
    gen_fn = jax.jit(lambda X, ctx: problem.generator.generate(X, ctx))
    from clip_glass_tpu.core.profiling import GenerationMeter, device_trace
    meter = GenerationMeter(config.pop_size * n_search)

    # artifact dumps run on a single worker thread: the device->host image
    # pull + JPEG encode (the expensive part of each periodic dump) overlaps
    # the next chunk of search steps instead of stalling them
    from concurrent.futures import ThreadPoolExecutor
    saver = ThreadPoolExecutor(max_workers=1)
    pending = []

    def _dump_one(X, F, gen, folder):
        if config.n_obj == 1:  # sorted by fitness (reference run.py:36-38)
            X = X[np.argsort(F[:, 0])]
        generated = gen_fn(jax.numpy.asarray(X), problem.generator.bundle)
        name = (f"genetic-it-{gen}.{ext}" if gen < config.generations
                else f"genetic-it-final.{ext}")
        pending.append(saver.submit(problem.generator.save, generated,
                                    os.path.join(folder, name)))

    def save_callback(state):
        gen = int(dist.fetch(state.gen).ravel()[0])
        X = dist.fetch(state.X)   # allgather when the mesh spans hosts
        F = dist.fetch(state.F)
        if dist.is_primary():     # process 0 owns the artifact directory
            if n_search > 1:
                for i, folder in enumerate(folders):
                    _dump_one(X[i], F[i], gen, folder)
            else:
                _dump_one(X, F, gen, config.tmp_folder)
        save_state(state, config.tmp_folder, config.name)
        # the first chunk's wall time is dominated by XLA compilation:
        # rebaseline there so reported rates are steady-state
        meter.set_generation(gen,
                             rebaseline=(meter.generation == 0 and gen > 0))
        if args.verbose and dist.is_primary() and meter.gens_per_sec > 0:
            print(f"  rate: {meter.gens_per_sec:.2f} gen/s "
                  f"({meter.candidates_per_sec:.1f} candidates/s)")

    state = load_state(config.tmp_folder) if args.resume else None
    if state is not None and (
            (state.X.ndim == 3) != (n_search > 1)
            or (state.X.ndim == 3 and state.X.shape[0] != n_search)):
        print("checkpoint does not match the --target count; starting fresh")
        state = None
    elif state is None and args.resume:
        print("no checkpoint found; starting fresh")
    if state is None:
        state = algorithm.init(jax.random.PRNGKey(config.seed))
    if mesh is not None:
        state = shard_state(state, mesh)

    gen0 = int(dist.fetch(state.gen).ravel()[0])
    remaining = config.generations - gen0
    phases["init(gen0)"] = time.perf_counter() - t0 - sum(phases.values())
    with device_trace(args.profile):
        if n_search > 1:
            results = minimize_batched(
                algorithm, n_gen=max(remaining, 0),
                key=jax.random.PRNGKey(config.seed),
                callback=save_callback, save_each=config.save_each,
                verbose=args.verbose, state=state)
        else:
            results = [minimize(algorithm, n_gen=max(remaining, 0),
                                key=jax.random.PRNGKey(config.seed),
                                callback=save_callback,
                                save_each=config.save_each,
                                verbose=args.verbose, state=state)]
    for fut in pending:  # surface any artifact-write error
        fut.result()
    saver.shutdown()
    phases["search+dumps"] = time.perf_counter() - t0 - sum(phases.values())

    # ---- final artifacts (reference run.py:79-125), one set per search
    if dist.is_primary():
        for res, folder in zip(results, folders):
            _final_artifacts(problem, config, res, folder, gen_fn)
    phases["final_artifacts"] = time.perf_counter() - t0 - sum(phases.values())
    if args.verbose:
        total = time.perf_counter() - t0
        parts = "  ".join(f"{k}={v:.1f}s" for k, v in phases.items())
        print(f"wallclock: total={total:.1f}s  {parts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
