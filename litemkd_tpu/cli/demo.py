"""Interactive episode demo (the reference's pywebio demo,
``multi_fusion.py:655-756``, without the external dependency): serves a small
HTML page that samples an episode, runs the model, and shows per-query
predictions vs ground truth. Works with the synthetic dataset out of the box.

    python -m litemkd_tpu.cli.demo --preset tiny --dataset synthetic --port 8089
    # then open http://localhost:8089
"""
from __future__ import annotations

import argparse
import html
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import jax

from .common import (enable_compilation_cache, add_common_args,
                     build_config, build_sampler, load_saved_config)


def build_runner(cfg, checkpoint_dir=None):
    import sys

    sampler = build_sampler(cfg, need_teacher=False)

    if checkpoint_dir and checkpoint_dir.endswith(".litemkd"):
        # serve an AOT artifact (cli.export --aot): the StableHLO scorer +
        # bundled weights — the production serving path, no model build at all
        from ..tools.aot import load_serving_artifact
        scorer, m = load_serving_artifact(checkpoint_dir)
        if m.get("kind", "scorer") != "scorer":
            raise ValueError(f"{checkpoint_dir} is a {m['kind']!r} artifact — "
                             "the demo serves episodic scorers")
        for key, want in (("way", cfg.episode.way), ("shot", cfg.episode.shot),
                          ("queries", cfg.episode.n_queries(False)),
                          ("img_size", cfg.episode.img_size),
                          ("seq_len", cfg.episode.seq_len), ("episodes", 1)):
            if m.get(key) != want:
                raise ValueError(
                    f"artifact geometry mismatch: {key}={m.get(key)} but the "
                    f"demo config needs {want} (re-export with matching "
                    "--preset/--aot_episodes 1)")
        print(f"serving AOT artifact {checkpoint_dir} "
              f"(platforms={m['platforms']})", file=sys.stderr)

        def score(batch):
            return np.asarray(scorer(batch.support_clips,
                                     batch.support_labels,
                                     batch.query_clips))[0]
    else:
        from ..train import create_train_state, CheckpointManager
        from ..distill import merge_logits
        from ..models import BatchedStudent

        rng = np.random.default_rng(cfg.train.seed)
        sample = sampler.sample_batch(rng, 1, train=False)
        state, _ = create_train_state(cfg, jax.random.key(0), sample)
        if checkpoint_dir:
            # the reference demo serves a trained model
            # (multi_fusion.py:676-680); status goes to stderr — `--once`
            # stdout must stay pure JSON
            state, _ = CheckpointManager(checkpoint_dir).restore(state)
            print(f"restored checkpoint @{int(state.episodes_seen)} episodes",
                  file=sys.stderr)
        else:
            print("WARNING: no --test_model_path given — serving RANDOM "
                  "weights", file=sys.stderr)
        student = BatchedStudent(cfg)

        # jit once, variables passed as an ARGUMENT: an eager apply would
        # dispatch op-by-op per request (minutes over the remote-TPU tunnel),
        # and a jitted closure over device params would inline them as HLO
        # constants (HTTP 413 on remote compile — see CLAUDE.md)
        @jax.jit
        def _scorer(variables, support_clips, support_labels, query_clips):
            out = student.apply(variables, support_clips, support_labels,
                                query_clips, train=False)
            return merge_logits(cfg.distill.name, out["logits"])

        def score(batch):
            return np.asarray(_scorer(state.variables, batch.support_clips,
                                      batch.support_labels,
                                      batch.query_clips))[0]

    def run_episode(seed: int):
        r = np.random.default_rng(seed)
        batch = sampler.sample_batch(r, 1, train=False)
        logits = score(batch)
        preds = logits.argmax(-1)
        truth = np.asarray(batch.query_labels)[0]
        return [{"query": int(i), "predicted": int(p), "true": int(t),
                 "correct": bool(p == t),
                 "logits": [round(float(x), 4) for x in logits[i]]}
                for i, (p, t) in enumerate(zip(preds, truth))]

    return run_episode


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--port", type=int, default=8089)
    p.add_argument("--test_model_path", "-m", default=None,
                   help="checkpoint dir or .litemkd AOT artifact to serve "
                        "(random weights otherwise)")
    p.add_argument("--once", action="store_true",
                   help="print one episode's results as JSON and exit (no server)")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args, base=load_saved_config(args.test_model_path))
    run_episode = build_runner(cfg, checkpoint_dir=args.test_model_path)

    if args.once:
        print(json.dumps(run_episode(0), indent=2))
        return

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            seed = 0
            if "seed=" in self.path:
                try:
                    seed = int(self.path.split("seed=")[1].split("&")[0])
                except ValueError:
                    pass
            rows = run_episode(seed)
            acc = sum(r["correct"] for r in rows) / len(rows)
            body = ["<html><head><title>litemkd_tpu demo</title></head><body>",
                    f"<h2>{cfg.episode.way}-way {cfg.episode.shot}-shot episode "
                    f"(seed {seed}) — accuracy {acc:.2f}</h2>",
                    f'<p><a href="/?seed={seed + 1}">next episode</a></p>',
                    "<table border=1 cellpadding=4><tr><th>query</th>"
                    "<th>predicted</th><th>true</th><th>ok</th><th>logits</th></tr>"]
            for r in rows:
                body.append(
                    f"<tr><td>{r['query']}</td><td>{r['predicted']}</td>"
                    f"<td>{r['true']}</td><td>{'✓' if r['correct'] else '✗'}</td>"
                    f"<td>{html.escape(str(r['logits']))}</td></tr>")
            body.append("</table></body></html>")
            data = "\n".join(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", args.port), Handler)
    print(f"demo serving on http://127.0.0.1:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
