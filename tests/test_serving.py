"""Continuous-batching server (clip_glass_tpu/serving.py): requests served
through resident slots must reproduce independent `evolve.minimize` runs
(the reference's one-process-per-target contract, reference run.py:22,
70-76), including under slot churn (more requests than slots) and
mid-flight admission."""

import dataclasses
import os
import threading

import numpy as np
import pytest

import jax

from clip_glass_tpu.config import get_config
from clip_glass_tpu.evolve.algorithm import minimize
from clip_glass_tpu.evolve.batched import _slice_ctx_of, make_batched
from clip_glass_tpu.fitness.problem import GenerationProblem
from clip_glass_tpu.models.clip import model as jclip
from clip_glass_tpu.serving import SearchServer


def _tiny_problem(use_d=True):
    from clip_glass_tpu.models.stylegan2 import model as sg2
    name = "StyleGAN2_ffhq_d" if use_d else "StyleGAN2_ffhq_nod"
    cfg = get_config(name).replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32, weights="random:0",
        target="a face", compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=sg2.TINY)


def _oracle(problem, server, target, ticket, n_gen):
    """Independent single-search run: same config/weights, ctx sliced from
    a fresh 1-target batched bundle, keyed fold_in(server_key, ticket)."""
    ctx = make_batched(problem, [target]).ctx
    algo = dataclasses.replace(problem.make_algorithm(),
                               ctx=_slice_ctx_of(ctx, 0))
    return minimize(algo, n_gen=n_gen,
                    key=jax.random.fold_in(server.key, ticket))


def test_server_churn_matches_independent_runs():
    """5 requests through 2 slots: every result (including ones admitted
    into recycled slots mid-flight) equals its independent run."""
    prob = _tiny_problem()
    server = SearchServer(prob, n_slots=2, chunk=2,
                          key=jax.random.PRNGKey(11))
    targets = [f"face variant {i}" for i in range(5)]
    tickets = [server.submit(t, n_gen=4) for t in targets]
    server.run()
    assert server.stats.completed == 5
    assert server.pending() == 0 and server.active() == 0
    for t, ticket in zip(targets, tickets):
        res = server.results[ticket]
        ref = _oracle(prob, server, t, ticket, 4)
        np.testing.assert_allclose(res.pop_X, ref.pop_X, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(res.pop_F, ref.pop_F, rtol=1e-4, atol=1e-5)
        assert int(res.state.gen) == 4


def test_server_staggered_admission():
    """A request submitted while another is mid-flight starts at gen 0 in
    its own slot (per-slot gen counters diverge) and still matches its
    independent run."""
    prob = _tiny_problem(use_d=False)
    server = SearchServer(prob, n_slots=2, chunk=2,
                          key=jax.random.PRNGKey(3))
    t0 = server.submit("early bird", n_gen=6)
    server.tick()                               # t0 at gen 2, slot 1 idle
    t1 = server.submit("late comer", n_gen=2)
    server.run()
    for ticket, target, n in [(t0, "early bird", 6), (t1, "late comer", 2)]:
        res = server.results[ticket]
        ref = _oracle(prob, server, target, ticket, n)
        np.testing.assert_allclose(res.pop_X, ref.pop_X, rtol=1e-5, atol=1e-5)


def test_server_rounds_n_gen_up_to_chunk():
    prob = _tiny_problem(use_d=False)
    server = SearchServer(prob, n_slots=1, chunk=4, key=jax.random.PRNGKey(0))
    ticket = server.submit("round me", n_gen=5)     # -> 8
    server.run()
    assert int(server.results[ticket].state.gen) == 8
    assert server.stats.occupancy == 1.0            # single slot, always busy


def test_server_threaded_submission():
    """submit() from another thread while the pump runs forever."""
    prob = _tiny_problem(use_d=False)
    server = SearchServer(prob, n_slots=2, chunk=2, key=jax.random.PRNGKey(9))
    tickets = []

    def client():
        tickets.append(server.submit("from a thread", n_gen=2))
        while len(server.results) < 1:
            pass
        server.stop()

    th = threading.Thread(target=client)
    th.start()
    server.run(forever=True)
    th.join()
    res = server.results[tickets[0]]
    ref = _oracle(prob, server, "from a thread", tickets[0], 2)
    np.testing.assert_allclose(res.pop_X, ref.pop_X, rtol=1e-5, atol=1e-5)


def test_server_host_eval_img2txt():
    """Serving captioning requests (GPT-2 img2txt) through the host-staged
    eval path: BPE round trips on the host, slots still isolated."""
    import os
    from clip_glass_tpu.models.gpt2 import model as g2
    img_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "gpt2_images")
    imgs = [os.path.join(img_dir, n) for n in ("dog.jpeg", "goldfish.jpeg")]
    cfg = get_config("GPT2").replace(
        weights="random:0", target=imgs[0], pop_size=4, dim_z=6, n_var=6,
        max_tokens_len=5, compute_dtype="float32")
    prob = GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=g2.TINY)
    server = SearchServer(prob, n_slots=2, chunk=1,
                          key=jax.random.PRNGKey(2), force_host_eval=True)
    assert server.balgo.host_eval
    tickets = [server.submit(p, n_gen=2) for p in imgs]
    server.run()
    for ticket, path in zip(tickets, imgs):
        res = server.results[ticket]
        ctx = make_batched(prob, [path], force_host_eval=True).ctx
        algo = dataclasses.replace(
            prob.make_algorithm(force_host_eval=True),
            ctx=_slice_ctx_of(ctx, 0))
        ref = minimize(algo, n_gen=2,
                       key=jax.random.fold_in(server.key, ticket))
        np.testing.assert_allclose(res.pop_X, ref.pop_X, rtol=1e-5, atol=1e-5)


def test_cli_serve_mode(tmp_path):
    """--serve FILE: streamed requests each get the reference artifact set
    under request-<ticket>/ (reference run.py:79-125 per request)."""
    from clip_glass_tpu.cli import main
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red flower\na blue car\nan old house\n")
    tmp = str(tmp_path / "out")
    rc = main(["--config", "StyleGAN2_ffhq_d", "--tiny", "--pop-size", "8",
               "--serve", str(prompts), "--slots", "2",
               "--generations", "2", "--save-each", "2",
               "--tmp-folder", tmp])
    assert rc == 0
    for i in range(3):
        folder = os.path.join(tmp, f"request-{i:04d}")
        for name in ("output.jpg", "genetic_result", "F.jpg",
                     "ls_result.npz", "target.txt"):
            assert os.path.exists(os.path.join(folder, name)), (i, name)
    with open(os.path.join(tmp, "request-0001", "target.txt")) as f:
        assert f.read() == "a blue car"


def test_server_mesh_sharded_matches_unsharded():
    """Slot-axis mesh serving (serving.py scale-out): the same request
    stream through a slot-sharded server on the 8-device mesh produces
    exactly the unsharded server's results — the slot axis is §11's
    embarrassingly-parallel search axis, so sharding is pure placement."""
    from clip_glass_tpu.parallel import make_mesh
    prob = _tiny_problem(use_d=False)
    targets = [f"portrait {i}" for i in range(5)]

    def serve(mesh):
        server = SearchServer(prob, n_slots=8, chunk=2,
                              key=jax.random.PRNGKey(7), mesh=mesh)
        tickets = [server.submit(t, n_gen=4) for t in targets]
        server.run()
        return [server.results[t] for t in tickets]

    base = serve(None)
    sharded = serve(make_mesh())
    for r0, r1 in zip(base, sharded):
        # X exact; F tolerates GSPMD reduction reassociation in the final
        # evaluation, same bar as test_parallel's sharded==single-device
        np.testing.assert_array_equal(r0.pop_X, r1.pop_X)
        np.testing.assert_allclose(r0.pop_F, r1.pop_F, rtol=1e-5, atol=1e-6)


def test_server_mesh_rejects_bad_fit():
    from clip_glass_tpu.parallel import make_mesh
    prob = _tiny_problem(use_d=False)
    with pytest.raises(ValueError, match="must divide"):
        SearchServer(prob, n_slots=3, chunk=2, mesh=make_mesh())


def test_server_map_convenience():
    prob = _tiny_problem(use_d=False)
    server = SearchServer(prob, n_slots=2, chunk=2, key=jax.random.PRNGKey(4))
    out = server.map(["one", "two", "three"], n_gen=2)
    assert len(out) == 3
    assert server.stats.completed == 3
    # churned 3 requests through 2 slots: some padding work on the idle slot
    assert 0.5 <= server.stats.occupancy <= 1.0
