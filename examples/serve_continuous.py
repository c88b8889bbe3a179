#!/usr/bin/env python
"""Continuous-batching serving: requests arrive over time, slots stay hot.

`serve_batched.py` shows K prompts known up-front. This example shows the
server form (`clip_glass_tpu.serving.SearchServer`): a fixed number of
resident slots run as one compiled program; a client thread submits
requests while the server pumps; finished slots are harvested and refilled
with queued requests by a data-only swap — no recompile per request, ever
(the LLM-serving continuous-batching pattern applied to latent-space
search; semantics of each request are bitwise an independent run,
tests/test_serving.py).

Runs on CPU in ~a minute with TINY models; drop --tiny on a TPU.

  python examples/serve_continuous.py --tiny --slots 2
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPTS = ["a red flower", "a blue car", "an old house",
           "a wolf at night", "a sunny beach"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="StyleGAN2_ffhq_d")
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--generations", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--weights", default="random:0")
    args = ap.parse_args()
    if args.tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.serving import SearchServer

    config = get_config(args.config).replace(
        target=PROMPTS[0], weights=args.weights)
    clip_cfg = model_cfg = None
    if args.tiny:
        from clip_glass_tpu.cli import _tinyfy
        config, clip_cfg, model_cfg = _tinyfy(config)

    problem = GenerationProblem(config, clip_cfg=clip_cfg, model_cfg=model_cfg)
    server = SearchServer(problem, n_slots=args.slots, chunk=args.chunk,
                          key=jax.random.PRNGKey(0))

    def client():
        tickets = []
        for p in PROMPTS:                      # requests trickle in
            tickets.append((server.submit(p, n_gen=args.generations), p))
            time.sleep(0.2)
        while len(server.results) < len(tickets):
            time.sleep(0.1)
        server.stop()
        for ticket, p in tickets:
            r = server.results[ticket]
            print(f"[{ticket}] {p!r}: best F = {float(r.pop_F.min()):+.4f} "
                  f"after {int(r.state.gen)} generations")

    th = threading.Thread(target=client)
    th.start()
    server.run(forever=True)                   # pump until client stops us
    th.join()
    s = server.stats
    print(f"served {s.completed} requests in {s.ticks} dispatches; "
          f"slot occupancy {s.occupancy:.0%}")


if __name__ == "__main__":
    main()
