"""Training observability: Chainer-LogReport-compatible JSON logging.

The reference relies on Chainer extensions (``LogReport`` writing a JSON
array file named ``log``, ``PrintReport`` console lines, ``ProgressBar``;
``/root/reference/train_coco_pose_estimation.py:258-263``) plus an args dump
to ``params.json`` and a timestamp marker file (``:268-275``).  This module
provides the same artifacts so downstream tooling (e.g. the reference's
``plot_train_log.py`` workflow) keeps working.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Dict, List, Optional


class TrainLogger:
    """Accumulates scalar observations and periodically flushes them to
    ``<out>/log`` as a JSON array (LogReport parity) + prints a report."""

    PRINT_KEYS = ("epoch", "iteration", "main/loss", "val/loss", "main/paf",
                  "val/paf", "main/heat", "val/heat", "elapsed_time")

    def __init__(self, out_dir: str, log_interval: int = 20):
        self.out_dir = out_dir
        self.log_interval = log_interval
        self.entries: List[dict] = []
        self._window: Dict[str, List[float]] = {}
        self._start = time.time()
        self._header_printed = False
        os.makedirs(out_dir, exist_ok=True)

    def observe(self, iteration: int, scalars: Dict[str, float],
                epoch: Optional[int] = None) -> None:
        for k, v in scalars.items():
            self._window.setdefault(k, []).append(float(v))
        if iteration % self.log_interval == 0 and self._window:
            entry = {k: sum(v) / len(v) for k, v in self._window.items()}
            entry["iteration"] = iteration
            entry["epoch"] = epoch if epoch is not None else 0
            entry["elapsed_time"] = time.time() - self._start
            self.entries.append(entry)
            self._window = {}
            self._flush()
            self._print(entry)

    def _flush(self) -> None:
        with open(os.path.join(self.out_dir, "log"), "w") as f:
            json.dump(self.entries, f, indent=2)

    def _print(self, entry: dict) -> None:
        if not self._header_printed:
            print("  ".join(f"{k:>12s}" for k in self.PRINT_KEYS))
            self._header_printed = True
        cells = []
        for k in self.PRINT_KEYS:
            v = entry.get(k)
            cells.append(f"{v:12.6g}" if isinstance(v, (int, float))
                         else " " * 12)
        print("  ".join(cells), flush=True)


class ProgressBar:
    """Console progress line with speed and ETA — the Chainer
    ``extensions.ProgressBar`` equivalent
    (``train_coco_pose_estimation.py:262``).  Pure host-side iteration
    counting: never touches device values, so it cannot de-async the
    training loop."""

    def __init__(self, total_iters: int, update_interval: int = 100,
                 bar_length: int = 50):
        self.total = max(total_iters, 1)
        self.interval = max(update_interval, 1)
        self.bar_length = bar_length
        self._start = time.time()
        self._start_iter: Optional[int] = None

    def update(self, iteration: int) -> None:
        first = self._start_iter is None
        if first:
            # timing starts at the FIRST observed iteration: its own work
            # happened before we saw it, so it anchors the window rather
            # than being (mis)counted in it.
            self._start_iter = iteration
            self._start = time.time()
        if iteration % self.interval and iteration != self.total:
            return
        frac = min(iteration / self.total, 1.0)
        filled = int(self.bar_length * frac)
        bar = "#" * filled + "." * (self.bar_length - filled)
        done = iteration - self._start_iter
        if first or done <= 0:
            rate = "   -- iters/sec  ETA --"
        else:
            speed = done / max(time.time() - self._start, 1e-9)
            eta = (self.total - iteration) / max(speed, 1e-9)
            rate = (f"{speed:.3f} iters/sec  "
                    f"ETA {datetime.timedelta(seconds=int(eta))}")
        print(f"     total [{bar}] {100 * frac:.2f}%  "
              f"{iteration}/{self.total} iter  {rate}", flush=True)


def dump_computation_graph(out_dir: str, jitted_fn, *example_args) -> str:
    """Write the lowered StableHLO of the training step to
    ``<out>/train_step.stablehlo.txt`` — the TPU-native analogue of
    Chainer's ``dump_graph('main/loss')`` .dot file
    (``train_coco_pose_estimation.py:258``): the full computation graph
    XLA will compile, inspectable offline."""
    os.makedirs(out_dir, exist_ok=True)
    text = jitted_fn.lower(*example_args).as_text()
    path = os.path.join(out_dir, "train_step.stablehlo.txt")
    with open(path, "w") as f:
        f.write(text)
    return path


def dump_run_params(out_dir: str, args: dict) -> None:
    """``params.json`` + ``@<timestamp>`` marker (ref ``:268-275``)."""
    os.makedirs(out_dir, exist_ok=True)
    stamp = "@" + datetime.datetime.now().strftime("%y%m%d_%H%M")
    open(os.path.join(out_dir, stamp), "w").close()
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump(args, f)
