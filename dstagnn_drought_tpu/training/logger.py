"""Structured metric logging: JSONL on disk + stdout lines + TensorBoard.

Replaces the reference's scattered prints and its dead tensorboardX wiring
(SummaryWriter imported but never constructed — train_DSTAGNN_my.py:16,
lib/utils1.py:377; SURVEY.md §5 observability). Here TensorBoard actually
works: pass ``tensorboard_dir`` (or set it on the Trainer via config) and
every numeric field of every event lands as a scalar series
``<event>/<field>`` keyed by the event's ``epoch`` (or occurrence count).
"""
from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
    def __init__(
        self,
        path: str | None = None,
        stream=None,
        quiet: bool = False,
        tensorboard_dir: str | None = None,
    ):
        self._file = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a")
        self._stream = stream or sys.stdout
        self._quiet = quiet
        self._t0 = time.time()
        self._tb = None
        self._counts: dict[str, int] = {}
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception as exc:  # optional dependency — JSONL still works
                print(f"tensorboard logging disabled: {exc}", file=self._stream)

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._tb is not None:
            step = fields.get("epoch")
            if step is None:
                step = self._counts.get(event, 0)
                self._counts[event] = step + 1
            for k, v in fields.items():
                if k != "epoch" and isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{event}/{k}", v, int(step))
        if not self._quiet:
            kv = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}", file=self._stream, flush=True)

    def close(self):
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.close()
