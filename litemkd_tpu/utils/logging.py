"""Structured metrics bus with pluggable sinks.

One logger replaces the reference's five overlapping systems (SURVEY.md §5.5:
``log.py`` timestamped files, wandb calls, ``print_and_log``, loguru/visdom):
scalars flow through ``MetricsLogger.log(step, dict)`` into any combination of
stdout, JSONL file, and wandb (gated — the package is optional here).
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Iterable, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 run_name: str = "run", print_freq: int = 10):
        self.print_freq = print_freq
        self.run_name = run_name
        self._jsonl = None
        self._wandb = None
        self._handler = None
        self._t0 = time.time()
        # per-instance logger: basicConfig is a no-op once ANY root handler
        # exists (a second MetricsLogger, or absl/jax configuring logging
        # first), which silently dropped the announced .log file
        self._logger = logging.getLogger(f"litemkd.{run_name}.{id(self)}")
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            stamp = time.strftime("%Y%m%d-%H%M%S")
            self._jsonl = open(os.path.join(log_dir, f"{stamp}_{run_name}.jsonl"),
                               "a", buffering=1)
            self.text_path = os.path.join(log_dir, f"{stamp}_{run_name}.log")
            self._handler = logging.FileHandler(self.text_path)
            self._handler.setFormatter(
                logging.Formatter("%(asctime)s %(message)s"))
            self._logger.addHandler(self._handler)
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                if wandb.run is None:   # reference: wandb.init (trainwandb.py:41)
                    wandb.init(project="litemkd_tpu", name=run_name)
            except ImportError:
                print("[metrics] wandb requested but not installed; skipping",
                      file=sys.stderr)
            except Exception as e:   # offline/no-credentials boxes
                self._wandb = None
                print(f"[metrics] wandb init failed ({e}); skipping",
                      file=sys.stderr)

    def log_config(self, cfg) -> None:
        blob = cfg.to_json() if hasattr(cfg, "to_json") else json.dumps(cfg)
        if self._jsonl:
            self._jsonl.write(json.dumps({"config": json.loads(blob)}) + "\n")
        if self._wandb and self._wandb.run:
            self._wandb.config.update(json.loads(blob), allow_val_change=True)

    def log(self, step: int, scalars: Dict[str, float],
            force_print: bool = False) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
        if self._wandb and self._wandb.run:
            self._wandb.log(scalars, step=int(step))
        if force_print or (self.print_freq and step % self.print_freq == 0):
            body = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
            print(f"[{self.run_name} {step}] {body}", flush=True)

    def save_artifact(self, path: str) -> None:
        """Mirror a saved checkpoint into the wandb run — the reference
        uploads every saved ``.pt`` via ``wandb.save`` (trainwandb.py:172-180).
        Orbax checkpoints are directories, so each contained file is saved
        relative to the directory's parent (wandb.save resolves its source
        glob NON-recursively, so a single ``dir/**`` pattern would match only
        the top-level entries and upload nothing); a plain file path is
        passed through as-is. No-op without an active wandb run."""
        if not (self._wandb and self._wandb.run):
            return
        try:
            if os.path.isdir(path):
                base = os.path.dirname(os.path.abspath(path))
                for root, _dirs, files in os.walk(path):
                    for name in files:
                        self._wandb.save(os.path.join(root, name),
                                         base_path=base)
            else:
                self._wandb.save(path)
        except Exception as e:   # upload failures must not kill training
            print(f"[metrics] wandb.save failed ({e}); continuing",
                  file=sys.stderr)

    def info(self, msg: str) -> None:
        print(msg, flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps({"info": msg}) + "\n")
        self._logger.info(msg)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._handler is not None:
            self._logger.removeHandler(self._handler)
            self._handler.close()
            self._handler = None
